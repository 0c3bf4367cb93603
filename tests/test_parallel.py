"""Sequence+data parallel forward pass on a virtual 8-device CPU mesh must
reproduce the single-device results bit-for-bit (halo re-compute exactness
and collective merge tie-breaks)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from ssw_tpu.ops import common, scan_sw
from ssw_tpu.parallel import dist, mesh as mesh_lib
from ssw_tpu import pipeline


@pytest.fixture(scope="module")
def problem():
    rng = np.random.default_rng(3)
    B, L, R = 16, 128, 2048
    mat = np.zeros((5, 5), np.int8)
    for i in range(4):
        for j in range(4):
            mat[i, j] = 2 if i == j else -2
    ref = rng.integers(0, 4, R).astype(np.int32)
    read_len = rng.integers(40, 110, B).astype(np.int32)
    reads = []
    for ln in read_len:
        off = int(rng.integers(0, R - ln))
        r = ref[off:off + ln].copy()
        m = rng.random(ln) < 0.15
        r[m] = rng.integers(0, 4, int(m.sum()))
        reads.append(r.astype(np.int32))
    mat_ext = common.extend_matrix(mat)
    rp = common.pad_reads(reads, L, 5)
    prof = common.build_profile(rp, read_len, mat_ext)
    geo = common.batch_geometry(read_len, L, word=False)
    return dict(mat=mat, ref=ref, reads=reads, read_len=read_len, prof=prof,
                geo=geo, B=B, L=L, R=R)


@pytest.mark.parametrize("data,seq,backend", [
    (1, 8, "scan"), (8, 1, "scan"), (2, 4, "scan"),
    (2, 4, "pallas"),   # pallas kernel under shard_map (interpret on CPU)
])
def test_sharded_forward_matches_single(problem, data, seq, backend):
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    p = problem
    mask_len = np.maximum(p["read_len"] // 2, 15).astype(np.int32)
    args = (jnp.asarray(p["prof"]), jnp.asarray(p["ref"]),
            jnp.asarray(p["read_len"]), jnp.asarray(p["geo"].col_mask),
            jnp.asarray(p["geo"].seg_id), jnp.asarray(p["geo"].seg_start))
    score, end_ref, end_read, maxcol = scan_sw.forward_shared_ref(
        *args, 3, 1, False)
    s2, re2 = scan_sw.second_best_batch(
        maxcol, end_ref, jnp.asarray(mask_len), p["R"],
        jnp.zeros(p["B"], bool))

    m = mesh_lib.make_mesh(data=data, seq=seq)
    halo = pipeline._window_len(int(p["read_len"].max()), p["R"], p["mat"],
                                3, 1)
    n = p["mat"].shape[0]
    ref_ext = np.concatenate([np.full(halo, n, np.int32), p["ref"]])
    out = dist.sharded_forward(
        m, jnp.asarray(p["prof"]), jnp.asarray(ref_ext),
        jnp.asarray(p["read_len"]), jnp.asarray(p["geo"].col_mask),
        jnp.asarray(p["geo"].seg_id), jnp.asarray(p["geo"].seg_start),
        3, 1, mask_len, p["R"], halo, quirk=False, backend=backend,
        max_sub=2)
    g_score, g_end_ref, g_end_read, g_s2, g_re2 = [np.asarray(x) for x in out]
    np.testing.assert_array_equal(g_score, np.asarray(score))
    np.testing.assert_array_equal(g_end_ref, np.asarray(end_ref))
    np.testing.assert_array_equal(g_end_read, np.asarray(end_read))
    np.testing.assert_array_equal(g_s2, np.asarray(s2))
    np.testing.assert_array_equal(g_re2, np.asarray(re2))
