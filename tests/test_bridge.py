"""JSON-lines bridge (the FFI-replacement surface used by bindings/java)."""

import io
import json

import numpy as np

from ssw_tpu import bridge
from ssw_tpu.core.encoding import dna_matrix, encode_dna

REF = "CAGCCTTTCTGACCCGGAAATCAAAATAGGCACAACAAA"
READ = "CTGAGCCGGTAAATC"


def _serve(lines):
    out = io.StringIO()
    rc = bridge.serve(inp=io.StringIO("\n".join(lines) + "\n"), out=out)
    return rc, [json.loads(l) for l in out.getvalue().splitlines()]


def _example_request(rid=0, **over):
    msg = {
        "id": rid,
        "read": [int(x) for x in encode_dna(READ)],
        "ref": [int(x) for x in encode_dna(REF)],
        "matrix": [int(x) for x in dna_matrix(2, 2).ravel()],
        "n": 5, "gap_open": 3, "gap_extend": 1, "flag": 1, "mask_len": 15,
    }
    msg.update(over)
    return msg


def test_bridge_example_pair():
    rc, resp = _serve([json.dumps(_example_request()), '{"op":"shutdown"}'])
    assert rc == 0
    r = resp[0]["result"]
    # reference example.c expected result (score 21, ref 8..21, read 0..14)
    assert r["score1"] == 21
    assert (r["ref_begin1"], r["ref_end1"]) == (8, 21)
    assert (r["read_begin1"], r["read_end1"]) == (0, 14)
    assert r["cigar_string"] == "9M1I5M"


def test_bridge_batch_and_errors():
    batch = {"id": 7, "batch": [_example_request(), _example_request()]}
    rc, resp = _serve([
        "not json",
        json.dumps(batch),
        json.dumps(_example_request(rid=9, n="bogus")),
        '{"op":"shutdown"}',
    ])
    assert rc == 0
    assert resp[0] == {"error": "bad json"}
    assert resp[1]["id"] == 7
    assert len(resp[1]["result"]) == 2
    assert resp[1]["result"][0]["score1"] == 21
    assert "error" in resp[2] and resp[2]["id"] == 9
