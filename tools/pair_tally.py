#!/usr/bin/env python3
"""Mirror of graft.Bench.pairStats for quick ledger inspection: clean-pair
median efficiency under the warmup (1.25x) + drain (1.15x) floor gates.
Usage: tools/pair_tally.py [ledger_dir]"""
import sys

ledger = sys.argv[1] if len(sys.argv) > 1 else "bench_ledger"
best = {}
for line in open(f"{ledger}/graft_bench_best_shm_drain.tsv"):
    k, v = line.split("\t")
    best[k] = float(v)
wb1, wb4 = best.get("w1", -1), best.get("w4", -1)
sb1, sb4 = best.get("l1:100000", -1), best.get("l4:100000", -1)
pairs, clean = [], []
for line in open(f"{ledger}/graft_bench_pairs_shm_drain.tsv"):
    parts = line.strip().split("\t")
    if len(parts) != 5 or parts[0] != "100000":
        continue
    s1, w1, s4, w4 = map(float, parts[1:])
    pairs.append((s1, w1, s4, w4))
    if (wb1 > 0 and wb4 > 0 and w1 <= 1.25 * wb1 and w4 <= 1.25 * wb4
            and (sb1 <= 0 or s1 <= 1.15 * sb1)
            and (sb4 <= 0 or s4 <= 1.15 * sb4)):
        clean.append(s1 / s4 / 4.0)
clean.sort()
effs = ", ".join(f"{e:.3f}" for e in clean)
print(f"pairs={len(pairs)} clean={len(clean)} effs=[{effs}]")
if clean:
    print(f"median={clean[len(clean) // 2]:.3f}")
print(f"floors: s1={sb1:.3f} s4={sb4:.3f} w1={wb1:.3f} w4={wb4:.3f} "
      f"eff_best={sb1 / sb4 / 4.0:.3f}")
