"""Host-ceiling control experiment (no Spark): how well does THIS box
scale a trivially parallel pure-Python tokenization workload?

multiprocessing.Pool over independent text chunks — no shuffle, no IPC
beyond the initial chunk hand-off, no shared state. Whatever efficiency
this measures at N vs 4N processes is the HOST's own ceiling (shared
Firecracker VM: steal bursts, one memory bus, kernel-side fault/TLB
overhead growing with worker count); a Spark pipeline cannot be
expected to beat it. Referenced by BENCH/BASELINE.md.

Usage: python tools/host_ceiling_control.py [n_docs] [procs...]
"""

from __future__ import annotations

import multiprocessing as mp
import random
import re
import sys
import time

_WORD = re.compile(r"[^\W_]+", re.UNICODE)

_VOCAB = [
    f"w{i:04d}" for i in range(2000)
] + ["the", "and", "of", "to", "ref", "second", "state"]


def _make_docs(n_docs: int, seed: int = 42) -> list[str]:
    rng = random.Random(seed)
    return [
        " ".join(rng.choice(_VOCAB) for _ in range(250)) for _ in range(n_docs)
    ]


def _work(docs: list[str]) -> int:
    total = 0
    for d in docs:
        toks = _WORD.findall(d.lower())
        total += len(toks)
    return total


def run_level(docs: list[str], procs: int, reps: int = 3) -> float:
    chunks = [docs[i::procs] for i in range(procs)]
    best = None
    with mp.Pool(procs) as pool:
        pool.map(_work, [c[:10] for c in chunks])  # warm the workers
        for _ in range(reps):
            t0 = time.perf_counter()
            n_tokens = sum(pool.map(_work, chunks))
            dt = time.perf_counter() - t0
            best = dt if best is None or dt < best else best
    return n_tokens / best


def main():
    n_docs = int(sys.argv[1]) if len(sys.argv) > 1 else 60_000
    levels = [int(x) for x in sys.argv[2:]] or [2, 8, 32]
    docs = _make_docs(n_docs)
    tps = {}
    for p in levels:
        tps[p] = run_level(docs, p)
        print(f"{p:3d} procs: {tps[p]/1e6:.2f}M tokens/s", flush=True)
    for lo, hi in zip(levels, levels[1:]):
        eff = (tps[hi] / tps[lo]) / (hi / lo)
        print(f"efficiency {lo}->{hi}: {eff:.2f}")


if __name__ == "__main__":
    main()
