"""OOD protocol-selection scorecard (VERDICT r3 items 4 + 7).

Reads the round-4 re-validated per-profile results (reference protocol
with round-3 tuning, warm start, auto) and prints, per test profile and
SNR, the three NMSE curves plus the auto protocol's deviation from the
better of {warm, reference} — the item-4 "Done" criterion is deviation
<= 0.3 dB at every cell.

Usage: python scripts/analyze_ood_auto.py  (pure numpy, CPU)
"""

import os

import numpy as np

PROFILES = ("CDL-C", "CDL-A", "CDL-B", "CDL-D")
BASE = "results/score"


def best_db(path):
    with np.load(path) as d:
        return d["snr_range"], 10 * np.log10(d["best_nmse"][0, 0])


def main():
    worst = (-1.0, None)
    for prof in PROFILES:
        d = os.path.join(BASE, f"train-CDL-C_test-{prof}")
        paths = {k: os.path.join(d, f"results_{k}.npz")
                 for k in ("r4", "warm_r4", "auto")}
        missing = [k for k, p in paths.items() if not os.path.exists(p)]
        if missing:
            print(f"{prof}: missing {missing} — skipped")
            continue
        snr, ref = best_db(paths["r4"])
        _, warm = best_db(paths["warm_r4"])
        _, auto = best_db(paths["auto"])
        best = np.minimum(ref, warm)
        dev = auto - best
        print(f"\n## {prof} (auto − best(warm, ref), dB)")
        print("| SNR | ref | warm | auto | best | auto dev |")
        print("|---|---|---|---|---|---|")
        for i, s in enumerate(snr):
            print(f"| {s:+.1f} | {ref[i]:.2f} | {warm[i]:.2f} | "
                  f"{auto[i]:.2f} | {best[i]:.2f} | {dev[i]:+.2f} |")
        i_w = int(np.argmax(dev))
        if dev[i_w] > worst[0]:
            worst = (float(dev[i_w]), f"{prof} @ {snr[i_w]:+.1f} dB")
        print(f"max deviation: {dev.max():+.2f} dB at "
              f"{snr[np.argmax(dev)]:+.1f} dB")
    if worst[1] is not None:
        ok = "PASS" if worst[0] <= 0.3 else "FAIL"
        print(f"\nOverall worst auto deviation: {worst[0]:+.2f} dB "
              f"({worst[1]}) → criterion ≤0.3 dB: {ok}")


if __name__ == "__main__":
    main()
