"""Chip roofline microbenchmarks: what THIS device actually delivers.

Measures delivered bf16 matmul TF/s, 3-D conv TF/s at the flagship's
dominant shapes, and elementwise HBM GB/s — the denominators for any
honest MFU claim about the 220^3 L6 whole-volume forward (BASELINE.md).
Nominal v5e peaks (197 TF/s bf16, 819 GB/s) are NOT what the relay chip
delivers; utilization must be judged against these measured lines.

Measurement discipline (see .claude/skills/verify/SKILL.md):
- inputs threaded as jit ARGUMENTS (zero-arg closures constant-fold);
- N iterations chained inside one jitted lax.scan (the per-dispatch relay
  round-trip would otherwise dominate);
- the only reliable fence is a dependent device->host transfer.

    python scripts/roofline.py            # all three, on the default chip
    python scripts/roofline.py --cpu      # smoke
"""

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--chain", type=int, default=8,
                    help="iterations chained inside one jitted scan")
    ap.add_argument("--small", action="store_true",
                    help="shrink shapes (CPU smoke)")
    ap.add_argument("--convprobe", action="store_true",
                    help="only the channel-width disambiguation convs")
    ap.add_argument("--foldprobe", action="store_true",
                    help="folded level-0 conv pattern vs the direct "
                         "narrow conv (see models/unet3d.py fold_l0)")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    from jax import lax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    from brainfm_tpu.utils.cache import setup_compilation_cache

    setup_compilation_cache()
    # opt-in: jax's miss-explanation code can CRASH the traced computation
    # on reused-function misses (see bench.py) — probes must not die for a
    # diagnostic
    if os.environ.get("BRAINFM_EXPLAIN_MISSES") == "1":
        jax.config.update("jax_explain_cache_misses", True)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

    N = args.chain

    def timed_chain(name, step, x0, flops=None, bytes_=None, reps=3):
        """Time N chained `step` applications inside one jitted scan."""

        @jax.jit
        def run(x):
            def body(c, _):
                return step(c), ()

            y, _ = lax.scan(body, x, None, length=N)
            return y

        t_w = time.time()
        print(f"# warm {name} ...", file=sys.stderr, flush=True)
        y = run(x0)
        np.asarray(jax.tree.leaves(y)[0].reshape(-1)[0])  # compile+warm
        print(f"# warm {name}: {time.time()-t_w:.1f}s",
              file=sys.stderr, flush=True)
        t0 = time.time()
        for _ in range(reps):
            y = run(x0)
            np.asarray(jax.tree.leaves(y)[0].reshape(-1)[0])
        dt = (time.time() - t0) / reps / N
        line = f"{name:<44s} {dt*1e3:9.2f} ms/iter"
        if flops:
            line += f"  {flops/dt/1e12:7.1f} TF/s"
        if bytes_:
            line += f"  {bytes_/dt/1e9:7.1f} GB/s"
        print(line)
        return dt

    # All operands are generated ON DEVICE (jax.random): a host-side
    # standard_normal + jnp.asarray would push GBs through the relay
    # tunnel per shape, which dominated earlier runs of this script.
    key = jax.random.PRNGKey(0)

    def dev_normal(shape, scale=1.0):
        return (jax.random.normal(key, shape, jnp.float32) * scale
                ).astype(jnp.bfloat16)

    def conv_chain(s, cin, cout, tag=""):
        k = jax.jit(dev_normal, static_argnums=0)((3, 3, 3, cin, cout), 0.01)
        x = jax.jit(dev_normal, static_argnums=0)((1, s, s, s, cin))

        def conv(x, k=k, cin=cin, cout=cout):
            y = lax.conv_general_dilated(
                x, k, (1, 1, 1), "SAME",
                dimension_numbers=("NDHWC", "DHWIO", "NDHWC"))
            # keep channel count constant so the scan chains; fold cout->cin
            if cout >= cin:
                y = y[..., :cin]
            else:
                y = jnp.concatenate([y] * (cin // cout), axis=-1)
            return y.astype(jnp.bfloat16)

        flops = 2.0 * s ** 3 * cin * cout * 27
        return timed_chain(f"conv3d bf16 {s}^3 x{cin}->{cout} 3^3{tag}",
                           conv, x, flops=flops)

    if args.foldprobe:
        # The fold_l0 bet (models/unet3d.py): a 3^3 SAME conv with
        # cout=64 at 220^3 (28-40 TF/s, MXU lane underfill) computed in
        # space-to-depth space = ONE 2^3 conv at 8x width (512->512,
        # the >200 TF/s regime) over 111^3 + 8 shifted slices. 2.43x the
        # FLOPs at ~5x the rate should net ~2x. This probe times the
        # EXACT folded pattern (pad + 2^3 conv + slices + concat) against
        # the direct conv it replaces. "eff TF/s" below = the DIRECT
        # conv's FLOPs / folded time (the apples-to-apples speedup).
        s, c = (110, 64) if not args.small else (28, 8)
        direct_flops = 2.0 * (2 * s) ** 3 * c * c * 27
        dt_direct = conv_chain(2 * s, c, c, tag=" [direct]")
        kf = jax.jit(dev_normal, static_argnums=0)((2, 2, 2, 8 * c, 8 * c),
                                                   0.01)
        xf = jax.jit(dev_normal, static_argnums=0)((1, s, s, s, 8 * c))

        def folded(x, kf=kf, c=c, s=s):
            y = lax.conv_general_dilated(
                x, kf, (1, 1, 1), [(1, 1)] * 3,
                dimension_numbers=("NDHWC", "DHWIO", "NDHWC"))
            parts = []
            for p1 in range(2):
                for p2 in range(2):
                    for p3 in range(2):
                        i = (p1 * 2 + p2) * 2 + p3
                        parts.append(y[:, p1:p1 + s, p2:p2 + s, p3:p3 + s,
                                       i * c:(i + 1) * c])
            return jnp.concatenate(parts, axis=-1).astype(jnp.bfloat16)

        dt_fold = timed_chain(
            f"folded conv {s}^3 x{8*c}->{8*c} 2^3 +slices", folded, xf,
            flops=direct_flops)
        print(f"# folded speedup vs direct: {dt_direct/dt_fold:.2f}x "
              f"(raw folded FLOPs run at "
              f"{2.0*(s+1)**3*8*(8*c)**2/dt_fold/1e12:.1f} TF/s)")
        return

    if args.convprobe:
        # Disambiguate the 64-channel conv penalty: same voxel count
        # (110^3), channel widths {64,128} on each side. If 64->64 is slow
        # at 110^3 too, the penalty is channel width (lanes/MXU feed), not
        # spatial extent; 64->128 vs 128->64 says whether K or N drives it.
        for cin, cout in ((64, 64), (128, 128), (64, 128), (128, 64),
                          (192, 64), (64, 512)):
            conv_chain(110, cin, cout)
        return

    # ---- 1. bf16 matmul (pure MXU ceiling)
    m = 1024 if args.small else 8192
    a = jax.jit(dev_normal, static_argnums=0)((m, m))
    timed_chain(f"matmul bf16 {m}x{m}x{m}",
                lambda x: (x @ a).astype(jnp.bfloat16), a,
                flops=2.0 * m ** 3)

    # ---- 2. conv3d at the flagship's dominant shapes (NDHWC, 3^3 kernel)
    # NOTE on diagnosing conv TF/s vs the square-matmul line: an im2col-
    # shaped matmul probe (M=voxels, K=27*cin, N=cout) cannot isolate the
    # MXU-width ceiling because at N=64 its arithmetic intensity
    # (~N/2 FLOP/B) is far below this chip's ~700 FLOP/B balance point —
    # any XLA-level skinny-N matmul is memory-bound reading the patch
    # matrix. The channel sweep below (64/128/256 at constant FLOPs) is
    # the meaningful width probe: conv reads x once (AI ~ 27*cout), so it
    # is compute-bound at every flagship width.
    convs = [(64, 64, 64), (110, 64, 128)] if args.small is False else \
        [(32, 8, 8)]
    if not args.small:
        convs = [(220, 64, 64),    # decoder level-0 / head conv (dominant)
                 (110, 128, 128),  # level-1
                 (55, 256, 256)]   # level-2
    for s, cin, cout in convs:
        conv_chain(s, cin, cout)

    # ---- 3. elementwise HBM bandwidth (GroupNorm-ish traffic shape)
    n = (64 if args.small else 220) ** 3 * 64
    v = jax.jit(dev_normal, static_argnums=0)((n // 64, 64))
    timed_chain(f"elementwise bf16 x*1.0001+0.1 ({v.size/1e6:.0f}M elems)",
                lambda x: (x * 1.0001 + 0.1).astype(jnp.bfloat16), v,
                bytes_=2.0 * v.size * 2)  # read + write, 2 B/elem

    # ---- 4. GroupNorm(8)+LeakyReLU at the dominant decoder shape — the
    # memory-bound chain save_convs remat recomputes
    if not args.small:
        x = jax.jit(dev_normal, static_argnums=0)((1, 220, 220, 220, 64))

        def gn(x):
            xs = x.reshape(1, -1, 8, 8)
            mu = jnp.mean(xs, axis=(1, 3), keepdims=True)
            var = jnp.var(xs, axis=(1, 3), keepdims=True)
            y = ((xs - mu) / jnp.sqrt(var + 1e-5)).reshape(x.shape)
            return jax.nn.leaky_relu(y).astype(jnp.bfloat16)

        timed_chain("groupnorm8+leakyrelu 220^3x64", gn, x,
                    bytes_=2.0 * x.size * 2)


if __name__ == "__main__":
    main()
    import os
    os._exit(0)  # axon relay thread is non-daemon
