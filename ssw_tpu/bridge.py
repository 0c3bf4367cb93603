"""Language-neutral alignment bridge: JSON-lines over stdin/stdout.

The reference exposes the C kernel to other languages through per-language
FFI shims (JNI — ref: src/sswjni.c:36-60; ctypes — ref: src/ssw_lib.py:94).
A TPU-resident engine can't be dlopen'ed into a JVM, so the TPU-native
equivalent is a worker process speaking a line protocol; bindings/java
contains the `ssw.Aligner` client with the reference's exact public API.

Protocol (one JSON object per line):

  request:  {"id": 0, "read": [codes], "ref": [codes],
             "matrix": [n*n flattened], "n": n,
             "gap_open": 3, "gap_extend": 1, "flag": 1,
             "filter_score": 0, "filter_distance": 0, "mask_len": 15,
             "score_size": 2}
            {"id": 1, "batch": [request, ...]}        # batched form
            {"op": "shutdown"}
  response: {"id": 0, "result": {"score1": ..., "score2": ...,
             "ref_begin1": ..., "ref_end1": ..., "read_begin1": ...,
             "read_end1": ..., "ref_end2": ..., "flag": ...,
             "cigar": [bam ints], "cigar_string": "..."}}
            result is null where the C API returns NULL.
"""

from __future__ import annotations

import json
import os
import sys

if os.environ.get("SSW_TPU_BRIDGE_PLATFORM"):
    # the axon sitecustomize ignores JAX_PLATFORMS; only a pre-first-use
    # config update selects the backend.  Worker subprocesses (Java/C
    # clients, tests) set SSW_TPU_BRIDGE_PLATFORM=cpu to stay off the TPU.
    import jax

    jax.config.update("jax_platforms",
                      os.environ["SSW_TPU_BRIDGE_PLATFORM"])

import numpy as np

from ssw_tpu import api
from ssw_tpu.core.cigar import cigar_int_to_len, cigar_int_to_op


def _dumps(obj) -> str:
    """Compact JSON: the Java client's hand-rolled intField parser scans
    digits immediately after '\"name\":' (bindings/java/ssw/Aligner.java),
    so the wire format must not carry a space after the colon."""
    return json.dumps(obj, separators=(",", ":"))


def _align_one(msg):
    n = int(msg["n"])
    mat = np.asarray(msg["matrix"], dtype=np.int8).reshape(n, n)
    r = api.align(
        np.asarray(msg["read"], dtype=np.int32),
        np.asarray(msg["ref"], dtype=np.int32),
        int(msg["gap_open"]), int(msg["gap_extend"]), mat=mat,
        flag=int(msg.get("flag", 0x0F)),
        filters=int(msg.get("filter_score", 0)),
        filterd=(2 ** 31 - 1 if msg.get("filter_distance") is None
                 else int(msg["filter_distance"])),
        mask_len=int(msg.get("mask_len", 15)),
        score_size=int(msg.get("score_size", 2)))
    return _result_dict(r)


def _result_dict(r):
    if r is None:
        return None
    cigar = [int(c) for c in (r.cigar or [])]
    return {
        "score1": r.score1, "score2": r.score2,
        "ref_begin1": r.ref_begin1, "ref_end1": r.ref_end1,
        "read_begin1": r.read_begin1, "read_end1": r.read_end1,
        "ref_end2": r.ref_end2, "flag": r.flag, "cigar": cigar,
        "cigar_string": "".join(
            f"{cigar_int_to_len(c)}{cigar_int_to_op(c)}" for c in cigar),
    }


def _align_many(msgs):
    """Batched form: requests sharing (ref, matrix, penalties, flags) run
    as ONE device batch through api.align_batch — this is the wire form
    the Java binding's alignBatch uses; mixed-config batches split into
    per-config groups."""
    results = [None] * len(msgs)
    groups: dict = {}
    for i, m in enumerate(msgs):
        key = (tuple(m["ref"]), tuple(m["matrix"]), int(m["n"]),
               int(m["gap_open"]), int(m["gap_extend"]),
               int(m.get("flag", 0x0F)), int(m.get("filter_score", 0)),
               (2 ** 31 - 1 if m.get("filter_distance") is None
                else int(m["filter_distance"])),
               int(m.get("score_size", 2)))
        groups.setdefault(key, []).append(i)
    for key, idxs in groups.items():
        (ref, mat_flat, n, gapO, gapE, flag, filters, filterd,
         score_size) = key
        mat = np.asarray(mat_flat, dtype=np.int8).reshape(n, n)
        reads = [np.asarray(msgs[i]["read"], dtype=np.int32) for i in idxs]
        mask = [int(msgs[i].get("mask_len", 15)) for i in idxs]
        rs = api.align_batch(
            reads, np.asarray(ref, dtype=np.int32), mat, gapO, gapE,
            flag=flag, filters=filters, filterd=filterd, mask_len=mask,
            score_size=score_size)
        for i, r in zip(idxs, rs):
            results[i] = _result_dict(r)
    return results


def serve(inp=None, out=None) -> int:
    inp = inp or sys.stdin
    out = out or sys.stdout
    for line in inp:
        line = line.strip()
        if not line:
            continue
        try:
            msg = json.loads(line)
        except ValueError:
            out.write(_dumps({"error": "bad json"}) + "\n")
            out.flush()
            continue
        if msg.get("op") == "shutdown":
            return 0
        try:
            if "batch" in msg:
                result = _align_many(msg["batch"])
            else:
                result = _align_one(msg)
            out.write(_dumps({"id": msg.get("id"), "result": result}) + "\n")
        except Exception as e:  # surface errors to the client, keep serving
            out.write(_dumps({"id": msg.get("id"), "error": str(e)}) + "\n")
        out.flush()
    return 0


if __name__ == "__main__":
    sys.exit(serve())
