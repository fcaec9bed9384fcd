"""Roofline accounting arithmetic (utils/roofline.py — SURVEY M5's
bytes-per-hop vs bandwidth model)."""

import numpy as np

from duckdb_lm_diskann_tpu.common.types import EdgeType, MetricType, VectorType
from duckdb_lm_diskann_tpu.core.graph import GraphParams
from duckdb_lm_diskann_tpu.utils.roofline import (
    device_hbm_gbps,
    edge_code_bytes,
    hop_roofline,
)


def make_params(edge_type, dims=128, r=64, vtype=VectorType.FLOAT32):
    return GraphParams(
        dims=dims, r=r, metric=MetricType.COSINE, edge_type=edge_type,
        alpha=1.2, l_insert=128, l_search=100, max_visits=400,
        node_vtype=vtype,
    )


def test_edge_code_bytes_per_codec():
    # D=128: ternary planes are 2*ceil(128/64)*8 = 32 B; 1bit = 16 B;
    # int8 = 128+4; int4 = 64+4; f32 = 512; f16 = 256; none = 512.
    want = {
        EdgeType.TERNARY: 32,
        EdgeType.FLOAT1BIT: 16,
        EdgeType.INT8: 132,
        EdgeType.INT4: 68,
        EdgeType.FLOAT32: 512,
        EdgeType.FLOAT16: 256,
        EdgeType.NONE: 512,
    }
    for et, b in want.items():
        assert edge_code_bytes(make_params(et)) == b, et


def test_hop_roofline_headline_config():
    # The benchmarked headline: 1M x 128d INT4, B=1024, L=100, W=1.
    p = make_params(EdgeType.INT4)
    rl = hop_roofline(p, batch=1024, l_search=100, mean_visits=104.0,
                      hbm_gbps=819.0)
    # gather = B*(D*4 + R*4 + R + R*68) = 1024*(512+256+64+4352) = 5,308,416
    assert rl.gather_bytes == 1024 * (512 + 256 + 64 + 64 * 68)
    # state = beam (B*L*9*2) + merge (B*164*12*2)
    assert rl.state_bytes == 1024 * 100 * 9 * 2 + 1024 * 164 * 12 * 2
    # SoL hop time ~= bytes / BW: at ~9.3 MB/hop and 819 GB/s, ~11 us.
    assert 5 < rl.sol_hop_us < 20
    # SoL QPS = B / (hops * hop_s); measured 6910 QPS -> fraction well < 1.
    assert rl.sol_qps > 100_000
    assert 0 < 6910 / rl.sol_qps < 0.2


def test_int8_node_vectors_cut_vector_bytes():
    f32 = hop_roofline(make_params(EdgeType.INT4), batch=64, l_search=100)
    i8 = hop_roofline(
        make_params(EdgeType.INT4, vtype=VectorType.INT8),
        batch=64, l_search=100,
    )
    assert f32.gather_bytes - i8.gather_bytes == 64 * 128 * 3


def test_device_kind_mapping():
    assert device_hbm_gbps("TPU v5 lite0") == 819.0
    assert device_hbm_gbps("TPU v4") == 1228.0
    assert device_hbm_gbps("cpu") == 819.0  # default
