"""Round-5 dead-tap audit (VERDICT r4 item 8).

Round 4 pruned FULLY-dead taps (dilated offsets reaching past the whole
spatial extent — only ever multiply padding zeros for EVERY output
position; models/layers.py Conv2d). This audit enumerates every conv in
the production NCSNv2-Deepest forward (by instrumenting Conv2d on a real
CPU forward — no hand-maintained list) and computes, per conv:

  - fully-dead taps remaining (should be none after the r4 pruning),
  - PARTIALLY-dead tap fraction: FLOPs spent on (tap, output-position)
    pairs that read padding zeros — removable exactly only by splitting
    the conv into boundary/interior position groups,
  - the e2e ceiling of such a split, weighting conv cost by MACs.

Run: PYTHONPATH=/root/repo python scripts/audit_dead_taps.py
(CPU; architecture facts only — timing lives in kernels/conv_probe.py).
"""

import numpy as np

import jax

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp

from score_based_channels_tpu.config import ModelConfig
from score_based_channels_tpu.models import make_score_model
from score_based_channels_tpu.models import layers as L

records = []
orig_call = L.Conv2d.__call__


def spy_call(self, x):
    records.append(dict(H=int(x.shape[1]), W=int(x.shape[2]),
                        cin=int(x.shape[-1]), cout=int(self.features),
                        k=int(self.kernel_size), d=int(self.dilation),
                        stride=int(self.stride)))
    return orig_call(self, x)


L.Conv2d.__call__ = spy_call

model = make_score_model(ModelConfig())  # production ngf=32 Deepest
x = jnp.zeros((1, 64, 16, 2), jnp.float32)
params = model.init(jax.random.key(0), x, jnp.float32(1.0))
L.Conv2d.__call__ = orig_call


def tap_liveness(n, k, d):
    """Per-axis: (live taps after r4 pruning, live (tap, pos) fraction).

    Output position p ∈ [0, n) with tap offset o = d·(j - k//2) reads
    input p + o; live iff 0 <= p + o < n. r4 pruning removes taps with
    d·|j - c| >= n (dead for ALL p)."""
    c = k // 2
    kept = [j for j in range(k) if d * abs(j - c) < n]
    live_pairs = sum(1 for j in kept for p in range(n)
                     if 0 <= p + d * (j - c) < n)
    return len(kept), live_pairs / (len(kept) * n)


total_macs = 0.0
live_macs = 0.0
print(f"{'shape':>10} {'k':>2} {'d':>2} {'cin':>4} {'cout':>4} "
      f"{'count':>5} {'kept taps':>9} {'live frac':>9} {'MAC share':>9}")
agg = {}
for r in records:
    key = (r["H"], r["W"], r["k"], r["d"], r["cin"], r["cout"], r["stride"])
    agg[key] = agg.get(key, 0) + 1
rows = []
for (H, W, k, d, cin, cout, stride), count in sorted(agg.items()):
    kh, fh = tap_liveness(H, k, d)
    kw, fw = tap_liveness(W, k, d)
    # MACs of the (r4-pruned) conv as executed, per sample
    out_h, out_w = H // stride, W // stride
    macs = out_h * out_w * kh * kw * cin * cout * count
    live = macs * fh * fw
    total_macs += macs
    live_macs += live
    rows.append(((H, W), k, d, cin, cout, count, (kh, kw), fh * fw, macs))
rows.sort(key=lambda t: -t[-1])
for (hw, k, d, cin, cout, count, kept, live_frac, macs) in rows:
    print(f"{str(hw):>10} {k:>2} {d:>2} {cin:>4} {cout:>4} {count:>5} "
          f"{str(kept):>9} {live_frac:>9.3f} {macs / 1e6:>8.2f}M")

print(f"\nconvs recorded: {len(records)} ({len(agg)} distinct shapes)")
print(f"total MACs/sample (post-r4-pruning): {total_macs/1e6:.1f}M")
print(f"live (tap,pos) MACs:                {live_macs/1e6:.1f}M "
      f"({100*live_macs/total_macs:.1f}%)")
print(f"=> exact boundary-split ceiling: "
      f"{100*(1 - live_macs/total_macs):.1f}% of conv MACs, before any "
      f"efficiency loss from splitting (real convs run at 54-94% of peak "
      f"per BENCH.md r4; split pieces are SMALLER and less efficient)")

# sanity: no fully-dead taps remain anywhere
for (H, W, k, d, cin, cout, stride), count in agg.items():
    kh, _ = tap_liveness(H, k, d)
    kw, _ = tap_liveness(W, k, d)
    full_kh = sum(1 for j in range(k) if True)
    assert kh == sum(1 for j in range(k) if d * abs(j - k // 2) < H)
    assert kw == sum(1 for j in range(k) if d * abs(j - k // 2) < W)
print("fully-dead-tap check: r4 pruning covers every conv "
      "(kept-tap counts equal the live-tap enumeration).")
