#!/usr/bin/env python3
"""Host scaling ceiling probe (no Spark, no JVM): independent Python
processes running a string-heavy loop (build/split/hash/join — the same
shape as the engine's text kernels). The ratio work(32 procs)/4·work(8
procs) is the HOST's own 8→32-core scaling ceiling for this workload class;
engine scaling efficiency should be judged against it on a shared VM, since
dedicated cluster nodes would put this ceiling near 1.0."""
import multiprocessing as mp
import sys
import time


def burn(seed):
    base = ("the quick brown fox %d " % seed) * 200
    t_end = time.time() + 3
    c = 0
    while time.time() < t_end:
        s = base.upper().lower()
        words = s.split()
        h = 0
        for w in words:
            h ^= hash(w)
        " ".join(words[:500])
        c += 1
    return c


def main():
    rates = {}
    for procs in (8, 32):
        with mp.Pool(procs) as p:
            rates[procs] = sum(p.map(burn, range(procs)))
        print(f"{procs} procs: {rates[procs]} units ({rates[procs]/procs:.0f}/proc)")
    eff = rates[32] / (4 * rates[8])
    print(f"host 8->32 scaling ceiling: {eff:.3f}")


if __name__ == "__main__":
    main()
