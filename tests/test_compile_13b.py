"""13B partition/compile gate (tools/compile_13b.py): the full 13B
train step must lower AND compile at TP=8 on the 8-device CPU mesh with
abstract params, and the SPMD executable's per-device argument bytes
must show the tree is genuinely sharded (~1/8th of the 26 GB bf16
total).  See COMPILE_13B.json for the committed artifact + the CPU
fp32-promotion caveat on temp bytes.
"""

import pytest

from tools.compile_13b import compile_13b


@pytest.mark.slow
def test_13b_compiles_and_partitions():
    report = compile_13b(n_devices=8, batch=2)
    assert report["params_billion"] > 12.5
    # per-device arguments ~ (26 GB bf16 params + trainable opt state)/8;
    # an unsharded tree would be >26 GB and could not report ~3.5
    assert report["per_device_argument_gb"] < 6.0
    if "per_device_peak_gb" in report:
        # B=2 fits 16 GB even under CPU XLA's fp32-promoted temps
        assert report["fits_16gb"], report
