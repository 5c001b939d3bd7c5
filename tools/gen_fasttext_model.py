#!/usr/bin/env python3
"""Self-train a tiny word-level fastText supervised model and write it in
the public .bin format (FASTTEXT_FILEFORMAT_MAGIC 793712314, version 12).

fastText supervised with minn=maxn=bucket=0 IS a softmax bag-of-words
classifier over the mean of the input word vectors (fasttext model.cc:
Model::computeHidden + SoftmaxLoss) — so a numpy SGD trainer reproduces
the training semantics exactly. The training corpus below is self-authored
(common function/content words per language, no external data). The model
is committed at src/main/resources/graft/lid.mini.bin and loaded by the
FastTextModel.fixture lazy val (src/main/scala/graft/functions/
FastText.scala) for the `language_id_ft` driver query, which exercises
the REAL .bin loader + inference path.

Provenance: every byte of the committed models derives from this script
(fixed seed), which ships in the repo. Re-run to regenerate both (arg =
output DIRECTORY):
    python3 tools/gen_fasttext_model.py src/main/resources/graft
"""
import struct, sys
import numpy as np

MAGIC, VERSION = 793712314, 12
DIM, EPOCHS, LR = 16, 60, 0.25
EOS = "</s>"

# self-authored per-language word pools (high-frequency function words +
# generic content words; spelled from memory, not copied from any corpus)
LANGS = {
    "en": ("the and of to in is was for with that this morning market garden "
           "quiet bright village children street near bridge river all very "
           "houses small under between evening people water light").split(),
    "fr": ("le la les et de des un une dans est était pour avec que ce matin "
           "marché jardin calme enfants rue près pont rivière tous très "
           "maisons petit sous entre soir gens eau lumière pense pas").split(),
    "de": ("der die das und von zu in ist war für mit dass heute markt garten "
           "ruhig hell dorf kinder straße nähe brücke fluss alle sehr häuser "
           "klein unter zwischen abend leute wasser licht schiffe nicht").split(),
    "es": ("el la los las y de a en es estaba para con que esta mañana "
           "mercado jardín tranquilo niños calle cerca puente río todos muy "
           "casas pequeño bajo entre tarde gente agua luz").split(),
    "it": ("il la i le e di a in è era per con che questa mattina mercato "
           "giardino tranquillo bambini strada vicino ponte fiume tutti "
           "molto case piccolo sotto tra sera gente acqua luce").split(),
}


def sentences(rng):
    """Deterministic synthetic labeled corpus: 400 sentences per language."""
    out = []
    for lang, pool in LANGS.items():
        for _ in range(400):
            n = rng.integers(5, 12)
            out.append((lang, [pool[i] for i in rng.integers(0, len(pool), n)]))
    return out


def ft_hash(s):
    """fastText's FNV-1a variant (dictionary.cc) — int32 wraparound, as
    unsigned. Must match FastTextModel.hash exactly: the Scala port XORs
    SIGN-EXTENDED bytes (bytes(i).toInt), so bytes >= 0x80 must be widened
    to ...FFFFFF00 | b before the XOR, not used raw (review-caught: the raw
    form differs on every non-ASCII n-gram and only cancelled under the
    power-of-two bucket by coincidence)."""
    h = 2166136261
    for b in s.encode("utf-8"):
        h ^= (b | 0xFFFFFF00) if b >= 0x80 else b
        h = (h * 16777619) & 0xFFFFFFFF
    return h


def subword_buckets(word, minn, maxn, bucket):
    """Char n-gram bucket ids of '<word>' — mirrors FastTextModel.subwordRows
    (ASCII corpus: no surrogate handling needed). For each start i, substrings
    of length minn..maxn; the n==1 edge exclusion only matters for minn==1."""
    w = "<" + word + ">"
    out = []
    for i in range(len(w)):
        for n in range(1, maxn + 1):
            j = i + n
            if j > len(w):
                break
            if n >= minn and not (n == 1 and (i == 0 or j == len(w))):
                out.append(ft_hash(w[i:j]) % bucket)
    return out


def main(out_path, minn=0, maxn=0, bucket=0, langs=None, unspaced=(),
         samples=400, dim=None, epochs=None, lr=None, seed=20260817):
    """Defaults reproduce the two committed mini fixtures byte-for-byte.
    `langs`/`unspaced`/`samples`/... drive the round-5 wide model:
    unspaced languages (CJK/Thai) train on CONCATENATED tokens that are
    deliberately NOT added to the vocabulary — the trainer then sees them
    exactly as inference sees real unspaced text (OOV word id, subword
    buckets only), mirroring how lid.176 handles CJK."""
    dim = DIM if dim is None else dim
    epochs = EPOCHS if epochs is None else epochs
    lr = LR if lr is None else lr
    rng = np.random.default_rng(seed)
    if langs is None:
        corpus = sentences(rng)
        langs = LANGS
    else:
        corpus = []
        for lang in langs:
            pool = langs[lang]
            for _ in range(samples):
                n = rng.integers(5, 12)
                toks = [pool[i] for i in rng.integers(0, len(pool), n)]
                if lang in unspaced:
                    # one giant unspaced token, sometimes sentence-final mark
                    tail = "\u3002" if (lang in ("zh", "ja") and rng.random() < 0.5) else ""
                    toks = ["".join(toks) + tail]
                corpus.append((lang, toks))
    labels = sorted(langs)  # __label__<code> in sorted order
    vocab = {}
    for lang, toks in corpus:
        if lang in unspaced:
            continue  # giant tokens stay OOV, like inference
        for t in toks:
            vocab.setdefault(t, len(vocab))
    vocab.setdefault(EOS, len(vocab))
    nwords, nlabels = len(vocab), len(labels)

    # input rows: word vectors then `bucket` hashed subword vectors —
    # inference averages word id + ALL subword buckets per token
    # (FastTextModel.predictScores), so training must build the same rows
    W_in = (rng.random((nwords + bucket, dim), dtype=np.float64) - 0.5) / dim
    W_out = np.zeros((nlabels, dim))

    def rows_of(toks):
        # OOV tokens (unspaced-language concatenations) contribute subword
        # buckets only — FastTextModel.predictScores does the same
        rows = [vocab[t] for t in toks if t in vocab] + [vocab[EOS]]
        if bucket > 0:
            for t in toks:
                rows.extend(nwords + b for b in subword_buckets(t, minn, maxn, bucket))
        return np.array(rows)

    idx = np.arange(len(corpus))
    for _ in range(epochs):
        rng.shuffle(idx)
        for k in idx:
            lang, toks = corpus[k]
            y = labels.index(lang)
            rows = rows_of(toks)
            hidden = W_in[rows].mean(axis=0)
            logits = W_out @ hidden
            p = np.exp(logits - logits.max())
            p /= p.sum()
            p[y] -= 1.0  # dL/dlogits for softmax cross-entropy
            grad_h = W_out.T @ p
            W_out -= lr * np.outer(p, hidden)
            np.add.at(W_in, rows, -lr * grad_h / len(rows))

    # training-set accuracy (should be 1.0 with disjoint-ish vocabularies)
    correct = 0
    for lang, toks in corpus:
        correct += labels[int(np.argmax(W_out @ W_in[rows_of(toks)].mean(axis=0)))] == lang
    print(f"train acc {correct / len(corpus):.4f}  vocab {nwords}  dim {dim} "
          f"minn {minn} maxn {maxn} bucket {bucket}")

    with open(out_path, "wb") as f:
        def i32(v): f.write(struct.pack("<i", v))
        def i64(v): f.write(struct.pack("<q", v))
        def f64(v): f.write(struct.pack("<d", v))
        i32(MAGIC); i32(VERSION)
        # args: dim ws epoch minCount neg wordNgrams loss model bucket minn
        #       maxn lrUpdateRate t   (args.cc::save order)
        i32(dim); i32(5); i32(epochs); i32(1); i32(5); i32(1); i32(3); i32(3)
        i32(bucket); i32(minn); i32(maxn); i32(100); f64(1e-4)
        # dictionary: size nwords nlabels ntokens pruneidx_size
        i32(nwords + nlabels); i32(nwords); i32(nlabels)
        i64(sum(len(t) for _, t in corpus)); i64(0)
        for w, _ in sorted(vocab.items(), key=lambda kv: kv[1]):
            f.write(w.encode("utf-8")); f.write(b"\x00"); i64(100); f.write(b"\x00")
        for l in labels:
            f.write(f"__label__{l}".encode("utf-8")); f.write(b"\x00")
            i64(100); f.write(b"\x01")
        f.write(b"\x00")  # input not quantized
        i64(nwords + bucket); i64(dim)
        f.write(W_in.astype("<f4").tobytes())
        f.write(b"\x00")  # output not quantized
        i64(nlabels); i64(dim)
        f.write(W_out.astype("<f4").tobytes())
    print(f"wrote {out_path}")




# ---------------------------------------------------------- round-5 wide model
# 36 self-authored language pools (common function words + everyday content
# words, spelled from memory — no external corpus). Latin-script languages
# train word-level+subword; UNSPACED ones (zh/ja/th) train on concatenated
# tokens so the trainer sees what inference sees on real unspaced text.
# zh includes the exact 40-char pool WebCorpusGen.zhDoc draws from, so the
# default-pipeline LID classifies the bench corpus's zh docs natively.
WIDE_LANGS = {
    "en": LANGS["en"] + ("that have with people some would because while "
                         "near reach came seemed again was other their "
                         "ancient narrow pleasant careful distant gentle "
                         "crowded peaceful golden wooden steady watched "
                         "crossed visited library station teacher window "
                         "journey harbor forest kitchen letter winter").split(),
    "fr": LANGS["fr"],
    "de": LANGS["de"],
    "es": LANGS["es"],
    "it": LANGS["it"],
    "pt": ("o os as um uma de do da em no na para com que ele ela muito "
           "quando sempre cidade mercado jardim tarde agua rio ponte "
           "crian\u00e7as rua noite manh\u00e3 aldeia").split(),
    "nl": ("de het een en van in is was voor met dat niet zijn op ook maar "
           "als bij naar door over onder tussen avond mensen water licht "
           "straat dorp kinderen brug rivier markt tuin").split(),
    "sv": ("och att det som en p\u00e5 \u00e4r av f\u00f6r med den inte har du jag vi "
           "om men alla mycket hus under mellan kv\u00e4ll vatten ljus morgon "
           "marknad tr\u00e4dg\u00e5rd by barn gata bro flod").split(),
    "da": ("og at det som en p\u00e5 er af for med den ikke har du jeg vi om "
           "men alle meget huse under mellem aften vand lys morgen marked "
           "have landsby b\u00f8rn gade bro flod").split(),
    "no": ("og at det som en p\u00e5 er av for med den ikke har du jeg vi om "
           "men alle sv\u00e6rt hus under mellom kveld vann lys morgen marked "
           "hage landsby barn gate bru elv").split(),
    "fi": ("ja on ei se ett\u00e4 oli h\u00e4n min\u00e4 sin\u00e4 me te he mutta kun "
           "my\u00f6s kaikki hyvin talo vesi valo ilta aamu tori puutarha "
           "kyl\u00e4 lapset katu silta joki").split(),
    "pl": ("i w na z \u017ce si\u0119 nie jest by\u0142 dla przez po jak ale te\u017c "
           "wszystkie bardzo domy woda \u015bwiat\u0142o wiecz\u00f3r rano targ "
           "ogr\u00f3d wie\u015b dzieci ulica most rzeka").split(),
    "cs": ("a v na s \u017ee se ne je byl pro p\u0159es po jak ale tak\u00e9 "
           "v\u0161echny velmi domy voda sv\u011btlo ve\u010der r\u00e1no trh zahrada "
           "vesnice d\u011bti ulice most \u0159eka").split(),
    "ro": ("\u0219i \u00een pe cu c\u0103 se nu este era pentru prin dup\u0103 cum dar "
           "toate foarte case ap\u0103 lumin\u0103 sear\u0103 diminea\u021b\u0103 pia\u021b\u0103 "
           "gr\u0103din\u0103 sat copii strad\u0103 pod r\u00e2u").split(),
    "hu": ("\u00e9s a az hogy nem van volt egy ez de is mint nagyon minden "
           "h\u00e1zak v\u00edz f\u00e9ny este reggel piac kert falu gyerekek utca "
           "h\u00edd foly\u00f3").split(),
    "tr": ("ve bir bu da de i\u00e7in ile de\u011fil var yok \u00e7ok her evler su "
           "\u0131\u015f\u0131k ak\u015fam sabah pazar bah\u00e7e k\u00f6y \u00e7ocuklar sokak "
           "k\u00f6pr\u00fc nehir ama gibi daha").split(),
    "id": ("dan yang di ke dari untuk dengan tidak adalah itu ini ada "
           "sangat semua rumah air cahaya malam pagi pasar kebun desa anak "
           "jalan jembatan sungai tetapi seperti").split(),
    "vi": ("v\u00e0 c\u1ee7a l\u00e0 trong kh\u00f4ng c\u00f3 \u0111\u01b0\u1ee3c cho v\u1edbi n\u00e0y \u0111\u00f3 "
           "r\u1ea5t m\u1ecdi nh\u00e0 n\u01b0\u1edbc s\u00e1ng bu\u1ed5i t\u1ed1i ch\u1ee3 v\u01b0\u1eddn l\u00e0ng "
           "tr\u1ebb em \u0111\u01b0\u1eddng c\u1ea7u s\u00f4ng nh\u01b0ng nh\u01b0").split(),
    "sw": ("na ya ni katika kwa si ana hii ile sana wote nyumba maji "
           "mwanga jioni asubuhi soko bustani kijiji watoto barabara "
           "daraja mto lakini kama zaidi").split(),
    "tl": ("at ng sa ay mga hindi may ito iyon napaka lahat bahay tubig "
           "liwanag gabi umaga palengke hardin nayon bata kalye tulay "
           "ilog ngunit tulad pa").split(),
    "ca": ("i el la els les un una de que no per amb en \u00e9s era molt "
           "tots cases aigua llum vespre mat\u00ed mercat jard\u00ed poble nens "
           "carrer pont riu per\u00f2 com").split(),
    "hr": ("i u na s da se ne je bio za kroz kako ali tako\u0111er sve vrlo "
           "ku\u0107e voda svjetlo ve\u010der jutro trg vrt selo djeca ulica "
           "most rijeka").split(),
    "sk": ("a v na s \u017ee sa nie je bol pre cez ako ale tie\u017e v\u0161etky "
           "ve\u013emi domy voda svetlo ve\u010der r\u00e1no trh z\u00e1hrada dedina "
           "deti ulica most rieka").split(),
    "et": ("ja on ei see et oli ta ma sa me te nad aga kui ka k\u00f5ik "
           "v\u00e4ga majad vesi valgus \u00f5htu hommik turg aed k\u00fcla lapsed "
           "t\u00e4nav sild j\u00f5gi").split(),
    "lt": ("ir \u012f ant su kad ne yra buvo u\u017e per po kaip bet taip visi "
           "labai namai vanduo \u0161viesa vakaras rytas turgus sodas kaimas "
           "vaikai gatv\u0117 tiltas up\u0117").split(),
    "lv": ("un uz ar ka ne ir bija par caur p\u0113c k\u0101 bet ar\u012b visi "
           "\u013coti m\u0101jas \u016bdens gaisma vakars r\u012bts tirgus d\u0101rzs ciems "
           "b\u0113rni iela tilts upe").split(),
    "ru": ("\u0438 \u0432 \u043d\u0430 \u0441 \u0447\u0442\u043e \u043d\u0435 \u044d\u0442\u043e \u0431\u044b\u043b \u0434\u043b\u044f \u0447\u0435\u0440\u0435\u0437 "
           "\u043f\u043e\u0441\u043b\u0435 \u043a\u0430\u043a \u043d\u043e \u0442\u0430\u043a\u0436\u0435 \u0432\u0441\u0435 \u043e\u0447\u0435\u043d\u044c \u0434\u043e\u043c\u0430 "
           "\u0432\u043e\u0434\u0430 \u0441\u0432\u0435\u0442 \u0432\u0435\u0447\u0435\u0440 \u0443\u0442\u0440\u043e \u0440\u044b\u043d\u043e\u043a \u0441\u0430\u0434 "
           "\u0434\u0435\u0440\u0435\u0432\u043d\u044f \u0434\u0435\u0442\u0438 \u0443\u043b\u0438\u0446\u0430 \u043c\u043e\u0441\u0442 \u0440\u0435\u043a\u0430 \u043a\u043e\u0433\u0434\u0430").split(),
    "uk": ("\u0456 \u0432 \u043d\u0430 \u0437 \u0449\u043e \u043d\u0435 \u0446\u0435 \u0431\u0443\u0432 \u0434\u043b\u044f \u0447\u0435\u0440\u0435\u0437 "
           "\u043f\u0456\u0441\u043b\u044f \u044f\u043a \u0430\u043b\u0435 \u0442\u0430\u043a\u043e\u0436 \u0432\u0441\u0456 \u0434\u0443\u0436\u0435 \u0431\u0443\u0434\u0438\u043d\u043a\u0438 "
           "\u0432\u043e\u0434\u0430 \u0441\u0432\u0456\u0442\u043b\u043e \u0432\u0435\u0447\u0456\u0440 \u0440\u0430\u043d\u043e\u043a \u0440\u0438\u043d\u043e\u043a \u0441\u0430\u0434 "
           "\u0441\u0435\u043b\u043e \u0434\u0456\u0442\u0438 \u0432\u0443\u043b\u0438\u0446\u044f \u043c\u0456\u0441\u0442 \u0440\u0456\u0447\u043a\u0430 \u043a\u043e\u043b\u0438").split(),
    "el": ("\u03ba\u03b1\u03b9 \u03c3\u03b5 \u03bc\u03b5 \u03c0\u03bf\u03c5 \u03b4\u03b5\u03bd \u03b5\u03af\u03bd\u03b1\u03b9 \u03ae\u03c4\u03b1\u03bd \u03b3\u03b9\u03b1 "
           "\u03b1\u03c0\u03cc \u03bc\u03b5\u03c4\u03ac \u03c0\u03c9\u03c2 \u03b1\u03bb\u03bb\u03ac \u03b5\u03c0\u03af\u03c3\u03b7\u03c2 \u03cc\u03bb\u03b1 \u03c0\u03bf\u03bb\u03cd "
           "\u03c3\u03c0\u03af\u03c4\u03b9\u03b1 \u03bd\u03b5\u03c1\u03cc \u03c6\u03c9\u03c2 \u03b2\u03c1\u03ac\u03b4\u03c5 \u03c0\u03c1\u03c9\u03af \u03b1\u03b3\u03bf\u03c1\u03ac "
           "\u03ba\u03ae\u03c0\u03bf\u03c2 \u03c7\u03c9\u03c1\u03b9\u03cc \u03c0\u03b1\u03b9\u03b4\u03b9\u03ac \u03b4\u03c1\u03cc\u03bc\u03bf\u03c2 \u03b3\u03ad\u03c6\u03c5\u03c1\u03b1 "
           "\u03c0\u03bf\u03c4\u03ac\u03bc\u03b9").split(),
    "ar": ("\u0641\u064a \u0645\u0646 \u0639\u0644\u0649 \u0623\u0646 \u0644\u0627 \u0647\u0648 \u0643\u0627\u0646 \u0625\u0644\u0649 "
           "\u0645\u0639 \u0647\u0630\u0627 \u0643\u0644 \u062c\u062f\u0627 \u0628\u064a\u0648\u062a \u0645\u0627\u0621 \u0636\u0648\u0621 "
           "\u0645\u0633\u0627\u0621 \u0635\u0628\u0627\u062d \u0633\u0648\u0642 \u062d\u062f\u064a\u0642\u0629 \u0642\u0631\u064a\u0629 "
           "\u0623\u0637\u0641\u0627\u0644 \u0634\u0627\u0631\u0639 \u062c\u0633\u0631 \u0646\u0647\u0631 \u0644\u0643\u0646 \u0645\u062b\u0644").split(),
    "he": ("\u05e9\u05dc \u05e2\u05dc \u05d0\u05ea \u05dc\u05d0 \u05d4\u05d5\u05d0 \u05d4\u05d9\u05d4 \u05d0\u05dc \u05e2\u05dd "
           "\u05d6\u05d4 \u05db\u05dc \u05de\u05d0\u05d5\u05d3 \u05d1\u05ea\u05d9\u05dd \u05de\u05d9\u05dd \u05d0\u05d5\u05e8 \u05e2\u05e8\u05d1 "
           "\u05d1\u05d5\u05e7\u05e8 \u05e9\u05d5\u05e7 \u05d2\u05df \u05db\u05e4\u05e8 \u05d9\u05dc\u05d3\u05d9\u05dd \u05e8\u05d7\u05d5\u05d1 "
           "\u05d2\u05e9\u05e8 \u05e0\u05d4\u05e8 \u05d0\u05d1\u05dc \u05db\u05de\u05d5").split(),
    "hi": ("\u0914\u0930 \u092e\u0947\u0902 \u092a\u0930 \u0915\u093f \u0928\u0939\u0940\u0902 \u0939\u0948 \u0925\u093e \u0915\u0947 "
           "\u0932\u093f\u090f \u0938\u093e\u0925 \u092f\u0939 \u0938\u092c \u092c\u0939\u0941\u0924 \u0918\u0930 \u092a\u093e\u0928\u0940 "
           "\u0930\u094b\u0936\u0928\u0940 \u0936\u093e\u092e \u0938\u0941\u092c\u0939 \u092c\u093e\u091c\u093e\u0930 \u092c\u0917\u0940\u091a\u093e "
           "\u0917\u093e\u0901\u0935 \u092c\u091a\u094d\u091a\u0947 \u0938\u0921\u093c\u0915 \u092a\u0941\u0932 \u0928\u0926\u0940 \u0932\u0947\u0915\u093f\u0928 "
           "\u091c\u0948\u0938\u0947").split(),
    "th": ("\u0e41\u0e25\u0e30 \u0e43\u0e19 \u0e1a\u0e19 \u0e27\u0e48\u0e32 \u0e44\u0e21\u0e48 \u0e40\u0e1b\u0e47\u0e19 \u0e2d\u0e22\u0e39\u0e48 "
           "\u0e2a\u0e33\u0e2b\u0e23\u0e31\u0e1a \u0e01\u0e31\u0e1a \u0e19\u0e35\u0e49 \u0e17\u0e31\u0e49\u0e07\u0e2b\u0e21\u0e14 \u0e21\u0e32\u0e01 "
           "\u0e1a\u0e49\u0e32\u0e19 \u0e19\u0e49\u0e33 \u0e41\u0e2a\u0e07 \u0e40\u0e22\u0e47\u0e19 \u0e40\u0e0a\u0e49\u0e32 \u0e15\u0e25\u0e32\u0e14 "
           "\u0e2a\u0e27\u0e19 \u0e2b\u0e21\u0e39\u0e48\u0e1a\u0e49\u0e32\u0e19 \u0e40\u0e14\u0e47\u0e01 \u0e16\u0e19\u0e19 \u0e2a\u0e30\u0e1e\u0e32\u0e19 "
           "\u0e41\u0e21\u0e48\u0e19\u0e49\u0e33 \u0e41\u0e15\u0e48 \u0e40\u0e0a\u0e48\u0e19").split(),
    "ja": ("\u3053\u308c \u305d\u308c \u3042\u308b \u3044\u308b \u3067\u3059 \u307e\u3057\u305f "
           "\u307e\u305b\u3093 \u3068\u3044\u3046 \u3053\u3068\u304c \u306b\u3064\u3044\u3066 \u65e5\u672c "
           "\u671d \u5e02\u5834 \u5ead \u6751 \u5b50\u4f9b \u9053 \u6a4b \u5ddd \u6c34 \u5149 "
           "\u5915\u65b9 \u9759\u304b \u4eba\u3005 \u5bb6 \u306e \u306f \u3092 \u306b \u304c "
           "\u3068 \u3067 \u3057\u305f").split(),
    "ko": ("\uadf8\ub9ac\uace0 \uc5d0\uc11c \uc704\uc5d0 \uac83 \uc544\ub2c8\ub2e4 \uc774\ub2e4 "
           "\uc788\ub2e4 \uc704\ud574 \ud568\uaed8 \uc774\uac83 \ubaa8\ub4e0 \ub9e4\uc6b0 \uc9d1 "
           "\ubb3c \ube5b \uc800\ub141 \uc544\uce68 \uc2dc\uc7a5 \uc815\uc6d0 \ub9c8\uc744 "
           "\uc544\uc774\ub4e4 \uae38 \ub2e4\ub9ac \uac15 \ud558\uc9c0\ub9cc \ucc98\ub7fc \uc6b0\ub9ac "
           "\ub098\ub294").split(),
    "zh": list("\u7684\u4e00\u662f\u5728\u4e0d\u4e86\u6709\u548c\u4eba\u8fd9\u4e2d\u5927\u4e3a\u4e0a\u4e2a\u56fd\u6211\u4ee5\u8981\u4ed6\u65f6\u6765\u7528\u4eec\u751f\u5230\u4f5c\u5730\u4e8e\u51fa\u5c31\u5206\u5bf9\u6210\u4f1a\u53ef\u4e3b\u53d1\u5e74\u52a8")
          + "\u5e02\u573a \u82b1\u56ed \u6751\u5e84 \u5b69\u5b50 \u8857\u9053 \u6865 \u6cb3 \u6c34 \u665a\u4e0a \u65e9\u6668".split(),
}
WIDE_UNSPACED = ("zh", "ja", "th")


if __name__ == "__main__":
    base = sys.argv[1] if len(sys.argv) > 1 else "src/main/resources/graft"
    main(f"{base}/lid.mini.bin")
    # subword variant: the lid.176-style path (char n-gram buckets make OOV
    # and misspelled words classifiable) — exercises FastTextModel.subwordRows
    main(f"{base}/lid.mini.sub.bin", minn=2, maxn=4, bucket=512)
    # round-5 wide model: 36 languages incl. unspaced CJK/Thai via the
    # subword path — the DEFAULT pipeline LID (graft.functions.Lid.default)
    main(f"{base}/lid.wide.bin", minn=2, maxn=4, bucket=4096,
         langs=WIDE_LANGS, unspaced=WIDE_UNSPACED, samples=300,
         dim=16, epochs=40, lr=0.35, seed=20260817)
