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


def test_batch_request_matches_per_item():
    """The batched wire form runs grouped device batches; results must be
    identical to per-item requests, incl. mixed configs and NULL results
    (score_size=0 overflow)."""
    import json

    from ssw_tpu import bridge

    rng = __import__("numpy").random.default_rng(3)
    ref = [int(x) for x in rng.integers(0, 4, 300)]
    mat = []
    for i in range(5):
        for j in range(5):
            mat.append(2 if (i == j and i < 4) else (-2 if i < 4 and j < 4
                                                    else 0))
    def req(read, **kw):
        base = {"read": read, "ref": ref, "matrix": mat, "n": 5,
                "gap_open": 3, "gap_extend": 1, "flag": 0x0F,
                "mask_len": 15, "score_size": 2}
        base.update(kw)
        return base

    reads = [ref[10:90], ref[50:120], [int(x) for x in rng.integers(0, 4, 70)],
             ref[0:280]]  # long overlap -> can overflow with score_size=0
    msgs = [req(reads[0]), req(reads[1], gap_open=5, gap_extend=2),
            req(reads[2]), req(reads[3], score_size=0)]
    batch = bridge._align_many(msgs)
    single = [bridge._align_one(m) for m in msgs]
    assert json.dumps(batch) == json.dumps(single)
