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


def main(out_path, minn=0, maxn=0, bucket=0):
    rng = np.random.default_rng(20260817)
    corpus = sentences(rng)
    labels = sorted(LANGS)  # __label__de, __label__en, ... (sorted order)
    vocab = {}
    for _, toks in corpus:
        for t in toks:
            vocab.setdefault(t, len(vocab))
    vocab.setdefault(EOS, len(vocab))
    nwords, nlabels = len(vocab), len(labels)

    # input rows: word vectors then `bucket` hashed subword vectors —
    # inference averages word id + ALL subword buckets per token
    # (FastTextModel.predictScores), so training must build the same rows
    W_in = (rng.random((nwords + bucket, DIM), dtype=np.float64) - 0.5) / DIM
    W_out = np.zeros((nlabels, DIM))

    def rows_of(toks):
        rows = [vocab[t] for t in toks] + [vocab[EOS]]
        if bucket > 0:
            for t in toks:
                rows.extend(nwords + b for b in subword_buckets(t, minn, maxn, bucket))
        return np.array(rows)

    idx = np.arange(len(corpus))
    for _ in range(EPOCHS):
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
            W_out -= LR * np.outer(p, hidden)
            np.add.at(W_in, rows, -LR * grad_h / len(rows))

    # training-set accuracy (should be 1.0 with disjoint-ish vocabularies)
    correct = 0
    for lang, toks in corpus:
        correct += labels[int(np.argmax(W_out @ W_in[rows_of(toks)].mean(axis=0)))] == lang
    print(f"train acc {correct / len(corpus):.4f}  vocab {nwords}  dim {DIM} "
          f"minn {minn} maxn {maxn} bucket {bucket}")

    with open(out_path, "wb") as f:
        def i32(v): f.write(struct.pack("<i", v))
        def i64(v): f.write(struct.pack("<q", v))
        def f64(v): f.write(struct.pack("<d", v))
        i32(MAGIC); i32(VERSION)
        # args: dim ws epoch minCount neg wordNgrams loss model bucket minn
        #       maxn lrUpdateRate t   (args.cc::save order)
        i32(DIM); i32(5); i32(EPOCHS); i32(1); i32(5); i32(1); i32(3); i32(3)
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
        i64(nwords + bucket); i64(DIM)
        f.write(W_in.astype("<f4").tobytes())
        f.write(b"\x00")  # output not quantized
        i64(nlabels); i64(DIM)
        f.write(W_out.astype("<f4").tobytes())
    print(f"wrote {out_path}")


if __name__ == "__main__":
    base = sys.argv[1] if len(sys.argv) > 1 else "src/main/resources/graft"
    main(f"{base}/lid.mini.bin")
    # subword variant: the lid.176-style path (char n-gram buckets make OOV
    # and misspelled words classifiable) — exercises FastTextModel.subwordRows
    main(f"{base}/lid.mini.sub.bin", minn=2, maxn=4, bucket=512)
