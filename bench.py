"""Benchmark: forward-DP throughput (GCUPS) on one chip.

Workload mirrors the reference's published benchmark (README.md:66-74):
~200bp reads vs a multi-Mbp reference at default penalties m2/x2/o3/e1.
The reference sustains ~1.1 GCUPS on one CPU core (9.9e11 cells in ~880s);
that is the vs_baseline denominator.

Prints ONE JSON line:
  {"metric": "GCUPS", "value": N, "unit": "GCUPS", "vs_baseline": N/1.1}

Timing covers the full forward pass (DP fill + suboptimal-scan inputs),
synchronized by a device->host transfer, which on this harness is the only
reliable completion barrier.  I/O and traceback are excluded, matching how
the survey prescribes honest GCUPS accounting (SURVEY.md section 6).

The kernel runs in whatever mode the production pipeline would pick for
this exact workload (pipeline._use_streaming): on TPU with a 1 Mbp target
that is the lanetrack/blockmax kernel (per-block maxima for the streaming
suboptimal scan) with the bounded-radius scan gate on.
"""

import json
import time

import numpy as np


def main():
    import jax

    # The axon tunnel wedges occasionally and recovers after ~10 min idle
    # (BENCH.md); a round-end bench that happens to land in a wedge window
    # should wait it out rather than die without printing its JSON line.
    for attempt in range(3):
        try:
            jax.devices()
            break
        except RuntimeError:
            if attempt == 2:
                raise
            time.sleep(300)

    # persistent compile cache: cold kernel compiles cost 60-90 s each
    # through the remote AOT helper; timing already excludes compiles, but
    # a warm cache keeps the whole run short
    import os
    cache = os.environ.get("JAX_COMPILATION_CACHE_DIR", "/root/jaxcache")
    try:
        os.makedirs(cache, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", cache)
    except Exception:
        pass

    import jax.numpy as jnp

    from ssw_tpu.ops import common

    platform = jax.devices()[0].platform
    use_pallas = platform != "cpu"
    if use_pallas:
        from ssw_tpu.ops import pallas_sw as kernel
    else:
        from ssw_tpu.ops import scan_sw as kernel

    rng = np.random.default_rng(42)
    READS, READ_LEN = 1024, 200
    R = 1 << 20 if use_pallas else 1 << 14
    B, L = 128, 256

    mat = np.zeros((5, 5), np.int8)
    for i in range(4):
        for j in range(4):
            mat[i, j] = 2 if i == j else -2
    mat_ext = common.extend_matrix(mat)
    ref = rng.integers(0, 4, R).astype(np.int32)
    read_len = np.full(B, READ_LEN, np.int32)
    geo = common.batch_geometry(read_len, L, word=False)

    def make_batch(seed):
        r = np.random.default_rng(seed)
        reads = []
        for _ in range(B):
            off = int(r.integers(0, R - READ_LEN))
            rd = ref[off:off + READ_LEN].copy()
            m = r.random(READ_LEN) < 0.05
            rd[m] = r.integers(0, 4, int(m.sum()))
            reads.append(rd)
        rp = common.pad_reads(reads, L, 5)
        return jnp.asarray(common.build_profile(rp, read_len, mat_ext))

    ref_d = jnp.asarray(ref)
    geo_args = (jnp.asarray(read_len), jnp.asarray(geo.col_mask),
                jnp.asarray(geo.seg_id), jnp.asarray(geo.seg_start))

    from ssw_tpu import pipeline

    kw = {"max_sub": 2} if use_pallas else {}
    streaming = pipeline._use_streaming(R, L,
                                        "pallas" if use_pallas else "scan")
    if streaming:
        kw.update(blockmax=True, valid_len=R)

    # lane packing: exactly the production decision for this workload
    # (pipeline._plan_pack) — 200bp reads pack ~19 to a 4096-lane row at
    # ~93% utilization instead of 200/256
    all_len = np.full(READS, READ_LEN, np.int32)
    plan = None
    if (use_pallas and streaming
            and os.environ.get("SSW_TPU_PACK", "1") != "0"):
        plan = pipeline._plan_pack(all_len, np.zeros(READS, bool), READS, L)

    def make_packed(seed):
        from ssw_tpu.ops import common as _c
        r = np.random.default_rng(seed)
        reads = []
        for _ in range(READS):
            off = int(r.integers(0, R - READ_LEN))
            rd = ref[off:off + READ_LEN].copy()
            m = r.random(READ_LEN) < 0.05
            rd[m] = r.integers(0, 4, int(m.sum()))
            reads.append(rd)
        rp = _c.pad_reads(reads, L, 5)
        pc = _c.pack_codes(plan, rp, 5)
        return pipeline._prep_packed(jnp.asarray(pc.astype(np.int8)),
                                     jnp.asarray(mat_ext))

    from ssw_tpu import profiling

    counter = profiling.GcupsCounter()
    counter.add_pairs([READ_LEN] * READS, R)

    def bench_packed():
        from ssw_tpu.ops import common as _c
        so, sl, rl_s = _c.pack_tables(plan, all_len)
        fi = plan.row * plan.S + plan.slot

        def run_packed(pprof):
            return kernel.forward_shared_ref_packed(
                pprof, ref_d, so, sl, rl_s, fi, 3, 1, max_sub=2,
                valid_len=R)

        pprofs = [make_packed(s) for s in range(2)]
        int(np.asarray(run_packed(pprofs[0])[0])[0])  # compile + warm
        with counter.phase("device"):
            out = run_packed(pprofs[1])
            int(np.asarray(out[0])[0])

    def bench_batched():
        def run(profile):
            return kernel.forward_shared_ref(profile, ref_d, *geo_args, 3,
                                             1, False, **kw)

        profiles = [make_batch(s) for s in range(1 + (READS // B))]
        int(np.asarray(run(profiles[0])[0])[0])  # compile + warm + sync
        n_batches = READS // B
        # queue all batches, then force one device->host transfer: the
        # device executes queued programs in order, and on this harness a
        # transfer is the only reliable completion barrier
        # (block_until_ready is a no-op over the tunnel) -- one barrier
        # instead of per-call round-trips
        with counter.phase("device"):
            outs = [run(profiles[1 + i]) for i in range(n_batches)]
            int(np.asarray(outs[-1][0])[0])

    # fallback cascade: the round-3 kernel modes (packed slots, blockmax
    # trackers) are exact but young — if a toolchain rejects one, report
    # the fastest mode that does compile instead of dying (the production
    # pipeline has the same escape hatches via SSW_TPU_PACK /
    # SSW_TPU_STREAM_SUBOPT)
    import sys
    modes = []
    if plan is not None:
        modes.append(("packed", bench_packed))
    modes.append(("batched", bench_batched))
    for name, fn in modes:
        try:
            fn()
            break
        except Exception as e:  # compile/runtime failure of a young mode
            counter.seconds.pop("device", None)
            if name == "batched" and kw.get("blockmax"):
                kw.pop("blockmax", None)
                kw.pop("valid_len", None)
                print(f"bench: {name}+blockmax failed ({e!r}); "
                      "retrying without blockmax", file=sys.stderr)
                bench_batched()
                break
            if name == modes[-1][0]:
                raise
            print(f"bench: {name} mode failed ({e!r}); falling back",
                  file=sys.stderr)

    gcups = counter.gcups("device")
    print(json.dumps({
        "metric": "GCUPS",
        "value": round(gcups, 2),
        "unit": "GCUPS",
        "vs_baseline": round(gcups / 1.1, 2),
    }))


if __name__ == "__main__":
    main()
