"""JPEG 2000 decoder (core/j2kcodec.py) — layer-by-layer tests.

Validation strategy: the MQ coder round-trips against the module's own
T.88 encoder; the full decoder is validated against openjpeg-produced
streams (via PIL) in the tests added as each layer lands.
"""

import numpy as np
import pytest

from deepwmh_tpu.core import j2kcodec as j2k


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_mq_roundtrip(seed):
    rng = np.random.RandomState(seed)
    for _ in range(40):
        n_cx = 19
        n = rng.randint(1, 5000)
        cxs = rng.randint(0, n_cx, n)
        bias = rng.rand(n_cx)
        bits = (rng.rand(n) < bias[cxs]).astype(int)
        enc = j2k._MQEncoder(n_cx)
        for cx, d in zip(cxs, bits):
            enc.encode(int(cx), int(d))
        dec = j2k._MQDecoder(enc.flush(), n_cx)
        got = [dec.decode(int(cx)) for cx in cxs]
        assert got == list(bits)


def test_mq_stuffing_and_carry():
    # all-LPS on a fresh context maximizes 0xFF production
    enc = j2k._MQEncoder(1)
    bits = [1, 0] * 500 + [1] * 300
    for d in bits:
        enc.encode(0, d)
    data = enc.flush()
    dec = j2k._MQDecoder(data, 1)
    assert [dec.decode(0) for _ in bits] == bits
