"""Config parsing/validation/layout tests.

Mirror the reference's rules: option parsing (db/LmDiskannIndex.cpp:72-110),
ValidateParameters (index_config.cpp:66-102), CalculateLayoutInternal
(index_config.cpp:104-148).
"""

import pytest

from duckdb_lm_diskann_tpu.common.types import EdgeType, MetricType, VectorType
from duckdb_lm_diskann_tpu.core.config import (
    LmDiskannConfig,
    calculate_layout,
    parse_options,
    ternary_plane_size_bytes,
    words_per_plane_u32,
    words_per_plane_u64,
)


def test_defaults_match_reference():
    # index_config.hpp:32-38
    c = LmDiskannConfig()
    assert c.metric_type is MetricType.COSINE
    assert c.r == 64
    assert c.l_insert == 128
    assert c.alpha == pytest.approx(1.2)
    assert c.l_search == 100


def test_parse_options_case_insensitive():
    c = parse_options({"METRIC": "COSINE", "R": 32, "L_Insert": 64,
                       "ALPHA": 1.5, "l_search": 50})
    assert c.metric_type is MetricType.COSINE
    assert c.r == 32 and c.l_insert == 64 and c.l_search == 50
    assert c.alpha == pytest.approx(1.5)


def test_parse_unknown_option_rejected():
    with pytest.raises(ValueError, match="Unknown LM_DISKANN option"):
        parse_options({"bogus": 1})


def _valid(metric=MetricType.COSINE, **kw):
    c = LmDiskannConfig(metric_type=metric, dimensions=128,
                        node_vector_type=VectorType.FLOAT32, **kw)
    return c


@pytest.mark.parametrize("field,value,msg", [
    ("r", 0, "R must be > 0"),
    ("l_insert", 0, "L_INSERT must be > 0"),
    ("alpha", 0.5, "ALPHA must be >= 1.0"),
    ("l_search", 0, "L_SEARCH must be > 0"),
])
def test_validate_rejects(field, value, msg):
    c = _valid()
    setattr(c, field, value)
    with pytest.raises(ValueError, match=msg):
        c.validate()


def test_validate_l_insert_ge_r():
    c = _valid(r=64, l_insert=32)
    with pytest.raises(ValueError, match="must be >= R"):
        c.validate()


def test_validate_requires_dims_and_type():
    c = LmDiskannConfig()
    with pytest.raises(ValueError, match="dimensions"):
        c.validate()
    c.dimensions = 16
    with pytest.raises(ValueError, match="node_vector_type"):
        c.validate()


def test_ternary_l2_rejected_but_int8_l2_allowed():
    # index_config.cpp:93-99: implicit TERNARY edges forbid L2.
    c = _valid(metric=MetricType.L2, edge_type=EdgeType.TERNARY)
    with pytest.raises(ValueError, match="not compatible with"):
        c.validate()
    # Our default for L2 is INT8 edges, which validates fine.
    c2 = _valid(metric=MetricType.L2)
    c2.validate()
    assert c2.resolve_edge_type() is EdgeType.INT8
    # COSINE defaults to the reference's implicit ternary edges.
    c3 = _valid()
    assert c3.resolve_edge_type() is EdgeType.TERNARY


def test_float1bit_cosine_only():
    # libSQL: "1-bit compression available only for cosine metric"
    # (vectordiskann.c:518).
    for metric in (MetricType.L2, MetricType.IP):
        c = _valid(metric=metric, edge_type=EdgeType.FLOAT1BIT)
        with pytest.raises(ValueError, match="only for cosine"):
            c.validate()
    _valid(metric=MetricType.COSINE, edge_type=EdgeType.FLOAT1BIT).validate()
    # FLOAT16 edges (libSQL F16) are metric-agnostic, like FLOAT32.
    for metric in (MetricType.L2, MetricType.IP, MetricType.COSINE):
        _valid(metric=metric, edge_type=EdgeType.FLOAT16).validate()


def test_words_per_plane():
    # WordsPerPlane = ceil(d/64); u32 device planes are the LE split.
    assert words_per_plane_u64(128) == 2
    assert words_per_plane_u64(96) == 2
    assert words_per_plane_u64(1) == 1
    assert words_per_plane_u32(128) == 4
    assert words_per_plane_u32(96) == 4  # padded to 2*ceil(96/64)
    assert ternary_plane_size_bytes(128) == 16


def test_layout_matches_reference_arithmetic():
    # Hand-computed from CalculateLayoutInternal (index_config.cpp:104-148)
    # for FLOAT32, D=128, R=64:
    #   count u16 @0; vector @8 (8B align), size 512 -> 520
    #   ids @520 (row_t aligned), 64*8=512 -> 1032
    #   pos planes @1032 (8B aligned), 64*16=1024 -> 2056
    #   neg planes @2056, +1024 -> 3080 total; block = 4096 (sector aligned)
    c = _valid(r=64)
    layout = calculate_layout(c)
    assert layout.neighbor_count_offset == 0
    assert layout.node_vector_offset == 8
    assert layout.neighbor_ids_offset == 520
    assert layout.neighbor_pos_planes_offset == 1032
    assert layout.neighbor_neg_planes_offset == 2056
    assert layout.ternary_edge_size_bytes == 32
    assert layout.total_node_size == 3080
    assert layout.block_size_bytes == 4096


def test_metric_aliases():
    assert MetricType.parse("L2SQ") is MetricType.L2
    assert MetricType.parse("cos") is MetricType.COSINE
    assert MetricType.parse("InnerProduct") is MetricType.IP
    with pytest.raises(ValueError):
        MetricType.parse("nope")
