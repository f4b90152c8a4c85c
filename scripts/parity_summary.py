"""Summarize the checkpoint-controlled parity campaign (round-4 VERDICT
item 3) from results/parity_ckpt.jsonl into the paired table ABLATION.md
reports. Safe on partial results — prints whatever pairs exist.

Decomposition per seed (all on the same vote seeds):
  eval effect   = m[t][fast] - m[t][paper]   (same ckpt, search recall only)
  train effect  = m[fast][paper] - m[paper][paper] (training dynamics only)
  total         = m[fast][fast] - m[paper][paper]  (the shipped default)
"""
import json
import sys
from collections import defaultdict

METRICS = ("full_mIoU", "B_IoU")


def main(path="results/parity_ckpt.jsonl"):
    by_seed = defaultdict(dict)  # seed -> (train_arm, eval_arm) -> rec
    try:
        with open(path) as f:
            for line in f:
                rec = json.loads(line)
                if rec.get("full_mIoU", 1.0) < 0.1:
                    # collapsed/diverged arm (e.g. a NaN checkpoint evaluates
                    # at chance level) — averaging it in would silently
                    # poison the campaign stats (round-4 postmortem).
                    print(f"WARNING: dropping collapsed row (mIoU "
                          f"{rec['full_mIoU']:.4f}): seed {rec['seed']} "
                          f"{rec['train_arm']}->{rec['eval_arm']}")
                    continue
                by_seed[rec["seed"]][(rec["train_arm"], rec["eval_arm"])] = rec
    except FileNotFoundError:
        print("no results yet"), sys.exit(0)

    for metric in METRICS:
        print(f"\n== {metric} ==")
        print(f"{'seed':>4} {'f/f':>7} {'f/p':>7} {'p/f':>7} {'p/p':>7} "
              f"{'evalΔ(f)':>9} {'evalΔ(p)':>9} {'trainΔ':>7} {'totalΔ':>7}")
        totals = defaultdict(list)
        for seed in sorted(by_seed):
            cells = by_seed[seed]

            def g(t, e):
                r = cells.get((t, e))
                return None if r is None else r[metric]

            ff, fp, pf, pp = (g("fast", "fast"), g("fast", "paper"),
                              g("paper", "fast"), g("paper", "paper"))

            def d(a, b):
                return None if a is None or b is None else a - b

            row = {"evalΔ(f)": d(ff, fp), "evalΔ(p)": d(pf, pp),
                   "trainΔ": d(fp, pp), "totalΔ": d(ff, pp)}
            for k, v in row.items():
                if v is not None:
                    totals[k].append(v)
            fmt = lambda v: "     --" if v is None else f"{v:7.4f}"
            print(f"{seed:>4} {fmt(ff)} {fmt(fp)} {fmt(pf)} {fmt(pp)} "
                  + " ".join(f"{('--' if v is None else f'{v:+.4f}'):>9}"
                             if k.startswith("eval") else
                             f"{('--' if v is None else f'{v:+.4f}'):>7}"
                             for k, v in row.items()))
        if totals:
            print("mean "
                  + "  ".join(f"{k}={sum(v)/len(v):+.4f}(n={len(v)})"
                              for k, v in totals.items()))

    # Arms outside the fast/paper 2x2 (e.g. the StaleBN production-candidate
    # arm 'fast_stale') — print verbatim next to the same seed's 2x2 cells.
    extra = [(s, k, r) for s, cells in sorted(by_seed.items())
             for k, r in cells.items()
             if k[0] not in ("fast", "paper") or k[1] not in ("fast", "paper")]
    if extra:
        print("\n== extra arms ==")
        for seed, (t, e), r in extra:
            ref = by_seed[seed].get(("fast", "fast"))
            delta = ("" if ref is None else
                     f"  (vs f/f: mIoU {r['full_mIoU']-ref['full_mIoU']:+.4f},"
                     f" B-IoU {r['B_IoU']-ref['B_IoU']:+.4f})")
            print(f"seed {seed} {t}->{e}: mIoU {r['full_mIoU']:.4f} "
                  f"B-IoU {r['B_IoU']:.4f}{delta}")


if __name__ == "__main__":
    main(*sys.argv[1:])
