"""Session-level extension settings.

The reference registers session options with DuckDB's config
(hnsw_index.cpp:655-679): ``hnsw_ef_search`` (overrides the search beam at
scan time, read in InitializeScan :291-299) and
``hnsw_enable_experimental_persistence``. This module is the standalone
analog: a process-wide settings registry with the same override semantics,
plus the LM-DiskANN spelling ``lm_diskann_l_search``.
"""

from __future__ import annotations

_SETTINGS: dict[str, object] = {
    # 0 / None -> no override; >0 -> overrides index/config l_search at scan.
    "lm_diskann_l_search": 0,
    "hnsw_ef_search": 0,  # alias kept for drop-in parity
    # Persistence is first-class here (not experimental), but the switch is
    # honored for compatibility: False disables checkpoint-on-commit.
    "lm_diskann_enable_persistence": True,
}


def set_option(name: str, value) -> None:
    key = name.strip().lower()
    if key not in _SETTINGS:
        raise KeyError(f"Unknown setting '{name}'")
    _SETTINGS[key] = value


def get_option(name: str):
    return _SETTINGS[name.strip().lower()]


def effective_l_search(index_l_search: int, explicit: int | None = None) -> int:
    """Resolution order at scan time (hnsw_index.cpp:291-299 semantics):
    explicit per-query param > session override > index config."""
    if explicit is not None and explicit > 0:
        return explicit
    for key in ("lm_diskann_l_search", "hnsw_ef_search"):
        v = _SETTINGS[key]
        if isinstance(v, int) and v > 0:
            return v
    return index_l_search
