#!/usr/bin/env python3
"""Planted multi-char OOV compound goldens for the zh segmenter's HMM path
(VERDICT r6 "Next round" #6).

The compounds below are INVENTED person / place / brand names — composed of
real Chinese name-register characters but, as words, absent from the
committed dict (the tool asserts that). Their expected segmentations are
derived with the INDEPENDENT Python port of the jieba DAG + finalseg HMM
(tools/diff_harness.py — the same port whose filter-level agreement with
the engine is 1.000000), NOT with the Scala engine, so the golden file is
a cross-implementation pin: graft.ZhOovCompoundSpec asserts the engine's
ZhSegmenter.cut reproduces every row byte-for-byte.

The list deliberately mixes emission regimes:
  - fully-unseen given-name chars (彧/犇/淼/焱/垚/琤/珣/骉/猋/麤...) where
    transitions alone decide the state path;
  - common surnames & morphemes (王/李/张/山/湾/集团...) whose emission
    mass is high, so the Viterbi must trade emission against transition;
  - 2/3/4-char shapes covering both the B..E span and the S fallback.

Usage: python3 tools/gen_zh_oov_goldens.py   # rewrites the golden tsv
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
import diff_harness

OUT = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                   "../src/main/resources/graft/zh_oov_golden.tsv")

# (compound, kind) — kind is documentation only
PLANTED = [
    # person names: surname + fully-unseen given chars
    ("王晟昱", "person"), ("李昶旻", "person"), ("张珩琤", "person"),
    ("刘彧", "person"), ("陈犇", "person"), ("杨淼焱", "person"),
    ("赵垚鑫", "person"), ("黄珣", "person"), ("周琰璨", "person"),
    ("吴瑄", "person"), ("徐骉", "person"), ("孙猋", "person"),
    ("马彧淼", "person"), ("朱焱垚", "person"), ("胡晟", "person"),
    ("郭昱琤", "person"), ("何珩", "person"), ("高旻昶", "person"),
    ("林瑄璨", "person"), ("罗琰", "person"),
    # person names: surname + mixed seen/unseen given chars
    ("王军彧", "person"), ("李磊犇", "person"), ("张伟淼", "person"),
    ("刘强焱", "person"), ("陈明垚", "person"), ("杨华晟", "person"),
    ("赵文昱", "person"), ("黄志珩", "person"), ("周国琰", "person"),
    ("吴天瑄", "person"), ("徐雨琤", "person"), ("孙云珣", "person"),
    # place names: unseen stem + real geographic suffix morpheme
    ("淼泉镇", "place"), ("焱阳村", "place"), ("垚山屯", "place"),
    ("犇牛湾", "place"), ("彧水河", "place"), ("琤玉溪", "place"),
    ("珣石坡", "place"), ("骉马坪", "place"), ("猋风口", "place"),
    ("麤林沟", "place"), ("晟光岭", "place"), ("昱明峪", "place"),
    ("昶平寨", "place"), ("旻天崖", "place"), ("珩玉洲", "place"),
    ("琰火滩", "place"),
    # brand-ish coined names (2-4 chars, mixed regimes)
    ("鑫晟达", "brand"), ("昶瑞", "brand"), ("珩宇", "brand"),
    ("琰茂祥", "brand"), ("瑄和堂", "brand"), ("淼源", "brand"),
    ("焱鼎", "brand"), ("垚盛隆", "brand"), ("犇腾", "brand"),
    ("彧风阁", "brand"), ("琤韵", "brand"), ("珣宝斋", "brand"),
    ("骉行天下", "brand"), ("猋速快运", "brand"), ("晟世华章", "brand"),
    ("昱辰星汉", "brand"),
]


def main():
    freq = diff_harness.ZH_FREQ
    rows = []
    shapes = {}
    for w, kind in PLANTED:
        assert freq.get(w, 0) == 0, f"{w} is a dict word — not OOV"
        cut = diff_harness.zh_cut(w)
        assert "".join(cut) == w, f"lossy cut for {w}: {cut}"
        rows.append((w, kind, cut))
        shapes.setdefault("/".join(str(len(p)) for p in cut), []).append(w)
    with open(OUT, "w", encoding="utf-8") as f:
        f.write("# compound\tkind\texpected segmentation (|-joined)\n")
        for w, kind, cut in rows:
            f.write(f"{w}\t{kind}\t{'|'.join(cut)}\n")
    print(f"wrote {len(rows)} goldens to {OUT}")
    for shape, ws in sorted(shapes.items()):
        print(f"  shape {shape}: {len(ws)}  e.g. {ws[0]}")


if __name__ == "__main__":
    main()
