"""Benchmark suite for the north-star metrics (BASELINE.json):

  1. forward-DP GCUPS on one chip (same workload as bench.py)
  2. end-to-end reads/s on a config-4 slice (Illumina 100bp vs 1M.fa,
     -r -c -s SAM pipeline, I/O + traceback included)
  3. data-parallel scaling of the sharded forward pass across mesh sizes
     (on real multi-chip hardware this is chips; on CPU it uses the
     virtual-device mesh and reports scaling efficiency of the collective
     design rather than silicon speed)

Writes one JSON object to stdout.  Usage:
  python tools/bench_suite.py [--reads N] [--skip-scaling] [--skip-e2e]
"""

from __future__ import annotations

import argparse
import gzip
import json
import os
import sys
import time

import numpy as np

HERE = os.path.dirname(os.path.abspath(__file__))
REPO = os.path.dirname(HERE)
sys.path.insert(0, REPO)


def bench_forward_gcups():
    import jax
    import jax.numpy as jnp
    from ssw_tpu.ops import common
    platform = jax.devices()[0].platform
    if platform != "cpu":
        from ssw_tpu.ops import pallas_sw as kernel
        kw = {"max_sub": 2}
        R = 1 << 20
        reads_n = 1024
    else:
        from ssw_tpu.ops import scan_sw as kernel
        kw = {}
        R = 1 << 14
        reads_n = 256
    rng = np.random.default_rng(42)
    READ_LEN, B, L = 200, 128, 256
    mat = np.zeros((5, 5), np.int8)
    for i in range(4):
        for j in range(4):
            mat[i, j] = 2 if i == j else -2
    mat_ext = common.extend_matrix(mat)
    ref = rng.integers(0, 4, R).astype(np.int32)
    rl = np.full(B, READ_LEN, np.int32)
    geo = common.batch_geometry(rl, L, word=False)
    args = (jnp.asarray(rl), jnp.asarray(geo.col_mask),
            jnp.asarray(geo.seg_id), jnp.asarray(geo.seg_start))
    ref_d = jnp.asarray(ref)

    def make(seed):
        r = np.random.default_rng(seed)
        reads = [ref[o:o + READ_LEN] for o in
                 r.integers(0, R - READ_LEN, B)]
        rp = common.pad_reads([x.copy() for x in reads], L, 5)
        return jnp.asarray(common.build_profile(rp, rl, mat_ext))

    profs = [make(s) for s in range(1 + reads_n // B)]
    run = lambda p: kernel.forward_shared_ref(p, ref_d, *args, 3, 1, False,
                                              **kw)
    int(np.asarray(run(profs[0])[0])[0])
    n = reads_n // B
    from ssw_tpu import profiling
    counter = profiling.GcupsCounter()
    counter.add_pairs([READ_LEN] * reads_n, R)
    with counter.phase("device"):
        outs = [run(profs[1 + i]) for i in range(n)]
        int(np.asarray(outs[-1][0])[0])
    return dict(gcups=round(counter.gcups("device"), 2),
                platform=platform,
                seconds=round(counter.device_seconds, 3))


def bench_e2e_reads_per_s(n_reads):
    """Config-4 slice through the real CLI pipeline (incl. parsing, rc,
    traceback, SAM rendering)."""
    import io as _io
    from ssw_tpu import cli
    fq = os.path.join(REPO, "bench_data", "100k_illumina1.fastq.gz")
    ref = os.path.join(REPO, "tests", "data", "1M.fa")
    if not os.path.exists(fq):
        return dict(skipped="bench_data missing; run tools/make_data.py")
    lines = []
    with gzip.open(fq, "rt") as f:
        for _ in range(n_reads * 4):
            lines.append(f.readline())
    import tempfile
    with tempfile.NamedTemporaryFile("w", suffix=".fastq",
                                     delete=False) as tf:
        tf.writelines(lines)
        path = tf.name
    try:
        out, err = _io.StringIO(), _io.StringIO()
        # warm-up on a tiny slice to exclude compile time
        warm = _io.StringIO()
        with open(path) as f:
            head = [next(f) for _ in range(4 * 64)]
        with tempfile.NamedTemporaryFile("w", suffix=".fastq",
                                         delete=False) as tw:
            tw.writelines(head)
        cli.main(["-c", "-s", "-h", "-r", ref, tw.name], out=warm, err=warm)
        os.unlink(tw.name)
        from ssw_tpu import pipeline, profiling
        counter = profiling.GcupsCounter()
        t0 = time.perf_counter()
        with pipeline.profiled(counter):
            cli.main(["-c", "-s", "-h", "-r", ref, path], out=out, err=err)
        dt = time.perf_counter() - t0
    finally:
        os.unlink(path)
    n_recs = sum(1 for l in out.getvalue().splitlines()
                 if l and not l.startswith("@"))
    return dict(reads=n_reads, records=n_recs, seconds=round(dt, 3),
                reads_per_s=round(n_reads / dt, 2),
                phases={k: round(v, 3)
                        for k, v in sorted(counter.seconds.items())},
                gcups_device=round(counter.gcups("forward"), 2))


def bench_scaling():
    """Sharded-forward throughput vs mesh size (same total work)."""
    import jax
    import jax.numpy as jnp
    from ssw_tpu import pipeline
    from ssw_tpu.ops import common
    from ssw_tpu.parallel import dist, mesh as mesh_lib
    n_dev = len(jax.devices())
    if n_dev < 2:
        return dict(skipped=f"{n_dev} device(s)")
    rng = np.random.default_rng(0)
    B, L, R = 64, 128, 4096 * 4
    mat = np.zeros((5, 5), np.int8)
    for i in range(4):
        for j in range(4):
            mat[i, j] = 2 if i == j else -2
    ref = rng.integers(0, 4, R).astype(np.int32)
    rl = np.full(B, 100, np.int32)
    reads = [rng.integers(0, 4, 100).astype(np.int32) for _ in range(B)]
    prof = common.build_profile(common.pad_reads(reads, L, 5), rl,
                                common.extend_matrix(mat))
    geo = common.batch_geometry(rl, L, word=False)
    halo = pipeline._window_len(100, R, mat, 3, 1)
    ref_ext = np.concatenate([np.full(halo, 5, np.int32), ref])
    mask_len = np.full(B, 50, np.int32)
    out = {}
    sizes = [s for s in (1, 2, 4, 8) if s <= n_dev]
    for s in sizes:
        mesh = mesh_lib.make_mesh(data=s, seq=1)
        run = lambda: dist.sharded_forward(
            mesh, jnp.asarray(prof), jnp.asarray(ref_ext), jnp.asarray(rl),
            jnp.asarray(geo.col_mask), jnp.asarray(geo.seg_id),
            jnp.asarray(geo.seg_start), 3, 1, mask_len, R, halo, False)
        np.asarray(run()[0])
        t0 = time.perf_counter()
        np.asarray(run()[0])
        out[f"data={s}"] = round(time.perf_counter() - t0, 4)
    t1 = out[f"data={sizes[0]}"]
    tn = out[f"data={sizes[-1]}"]
    if jax.devices()[0].platform == "cpu":
        # virtual devices share the same host cores: wall time cannot
        # improve, so the meaningful number is how much overhead the
        # sharding machinery + collectives add (1.0 = none)
        out["collective_overhead_vs_single"] = round(tn / t1, 2)
        out["note"] = ("virtual CPU mesh: speedup not measurable, "
                       "reporting sharding overhead instead")
    else:
        out["speedup"] = round(t1 / tn, 2)
        out["efficiency_vs_linear"] = round(
            (t1 / tn) / (sizes[-1] / sizes[0]), 2)
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--reads", type=int, default=2000)
    ap.add_argument("--skip-scaling", action="store_true")
    ap.add_argument("--skip-e2e", action="store_true")
    ap.add_argument("--platform", default=None, choices=("cpu", "tpu"),
                    help="force a JAX platform (the axon sitecustomize "
                         "ignores JAX_PLATFORMS; jax.config is needed)")
    ap.add_argument("--fake-devices", type=int, default=0,
                    help="with --platform cpu: number of virtual host "
                         "devices for the scaling benchmark")
    args = ap.parse_args()
    if args.fake_devices:
        os.environ["XLA_FLAGS"] = (
            os.environ.get("XLA_FLAGS", "") +
            f" --xla_force_host_platform_device_count={args.fake_devices}"
        ).strip()
    if args.platform:
        import jax
        jax.config.update("jax_platforms", args.platform)
    report = {"forward": bench_forward_gcups()}
    if not args.skip_e2e:
        report["e2e_config4"] = bench_e2e_reads_per_s(args.reads)
    if not args.skip_scaling:
        report["scaling"] = bench_scaling()
    print(json.dumps(report, indent=2))


if __name__ == "__main__":
    main()
