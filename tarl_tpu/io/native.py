"""ctypes binding to the native C++ MATSim ingestion library.

The native tier (native/src/matsim_parser.cpp) replaces the lxml + Python
loops of the reference ingestion (transportation_simulator.py:61-228,
agents/base.py:38-242) for large scenarios.  The library is built on demand
with ``make -C native`` (g++, zlib); everything degrades gracefully to the
pure-Python parser in :mod:`tarl_tpu.io.matsim` when the toolchain or a
parser feature (e.g. the coordinate KDTree fallback) is unavailable.
"""
from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Optional

import numpy as np

_REPO_ROOT = os.path.abspath(os.path.join(os.path.dirname(__file__), "..", ".."))
_LIB_PATH = os.path.join(_REPO_ROOT, "native", "build", "libtarl_native.so")
_lib = None
_lib_failed = False


def _load_lib() -> Optional[ctypes.CDLL]:
    global _lib, _lib_failed
    if _lib is not None or _lib_failed:
        return _lib
    if not os.path.exists(_LIB_PATH):
        try:
            subprocess.run(
                ["make", "-C", os.path.join(_REPO_ROOT, "native")],
                check=True, capture_output=True, timeout=120,
            )
        except Exception:
            _lib_failed = True
            return None
    try:
        lib = ctypes.CDLL(_LIB_PATH)
    except OSError:
        _lib_failed = True
        return None

    lib.tarl_parse_network.restype = ctypes.c_void_p
    lib.tarl_parse_network.argtypes = [ctypes.c_char_p]
    lib.tarl_net_error.restype = ctypes.c_char_p
    lib.tarl_net_error.argtypes = [ctypes.c_void_p]
    lib.tarl_net_num_links.restype = ctypes.c_int64
    lib.tarl_net_num_links.argtypes = [ctypes.c_void_p]
    lib.tarl_net_num_intersections.restype = ctypes.c_int64
    lib.tarl_net_num_intersections.argtypes = [ctypes.c_void_p]
    lib.tarl_net_cell_size.restype = ctypes.c_double
    lib.tarl_net_cell_size.argtypes = [ctypes.c_void_p]
    f64p = np.ctypeslib.ndpointer(np.float64, flags="C_CONTIGUOUS")
    i32p = np.ctypeslib.ndpointer(np.int32, flags="C_CONTIGUOUS")
    f32p = np.ctypeslib.ndpointer(np.float32, flags="C_CONTIGUOUS")
    i64p = np.ctypeslib.ndpointer(np.int64, flags="C_CONTIGUOUS")
    lib.tarl_net_fill.argtypes = [ctypes.c_void_p, f64p, f64p, f64p, f64p, i32p, i32p]
    lib.tarl_net_coords.argtypes = [ctypes.c_void_p, f64p, f64p]
    lib.tarl_net_ids_size.restype = ctypes.c_int64
    lib.tarl_net_ids_size.argtypes = [ctypes.c_void_p]
    lib.tarl_net_ids_fill.argtypes = [ctypes.c_void_p, ctypes.c_char_p]
    lib.tarl_net_free.argtypes = [ctypes.c_void_p]

    lib.tarl_parse_population.restype = ctypes.c_void_p
    lib.tarl_parse_population.argtypes = [ctypes.c_char_p, ctypes.c_char_p]
    lib.tarl_pop_error.restype = ctypes.c_char_p
    lib.tarl_pop_error.argtypes = [ctypes.c_void_p]
    lib.tarl_pop_needs_fallback.restype = ctypes.c_int32
    lib.tarl_pop_needs_fallback.argtypes = [ctypes.c_void_p]
    lib.tarl_pop_num_rows.restype = ctypes.c_int64
    lib.tarl_pop_num_rows.argtypes = [ctypes.c_void_p]
    lib.tarl_pop_fill.argtypes = [ctypes.c_void_p, f32p]
    lib.tarl_pop_stats.argtypes = [ctypes.c_void_p, i64p]
    lib.tarl_pop_free.argtypes = [ctypes.c_void_p]
    _lib = lib
    return _lib


def available() -> bool:
    return _load_lib() is not None


def parse_network_native(actual_path: str):
    """Parse a resolved network XML path; returns the same fields as
    :class:`tarl_tpu.io.matsim.ParsedNetwork` or ``None`` on failure."""
    lib = _load_lib()
    if lib is None:
        return None
    h = lib.tarl_parse_network(actual_path.encode())
    if not h:
        return None
    try:
        err = lib.tarl_net_error(h)
        if err:
            return None
        n = lib.tarl_net_num_links(h)
        ni = lib.tarl_net_num_intersections(h)
        length = np.empty(n, np.float64)
        capacity = np.empty(n, np.float64)
        freespeed = np.empty(n, np.float64)
        permlanes = np.empty(n, np.float64)
        from_idx = np.empty(n, np.int32)
        to_idx = np.empty(n, np.int32)
        lib.tarl_net_fill(h, length, capacity, freespeed, permlanes,
                          from_idx, to_idx)
        x = np.empty(ni, np.float64)
        y = np.empty(ni, np.float64)
        lib.tarl_net_coords(h, x, y)
        ids_size = lib.tarl_net_ids_size(h)
        buf = ctypes.create_string_buffer(int(ids_size))
        lib.tarl_net_ids_fill(h, buf)
        ids = buf.raw.decode().split("\n")[:-1]
        return {
            "length": length,
            "max_flow": capacity,
            "free_speed": freespeed,
            "perm_lanes": permlanes,
            "from_inter": from_idx.astype(np.int64),
            "to_inter": to_idx.astype(np.int64),
            "sorted_intersections": ids,
            "node_positions": {i: (float(a), float(b))
                               for i, a, b in zip(ids, x, y)},
            "effective_cell_size": float(lib.tarl_net_cell_size(h)),
        }
    finally:
        lib.tarl_net_free(h)


def parse_population_native(pop_path: str, net_path: str):
    """Parse resolved population+network paths into the reference's [A, 9]
    trip matrix.  Returns (rows, stats_dict) or ``None`` when the scenario
    needs the Python coordinate-fallback path."""
    lib = _load_lib()
    if lib is None:
        return None
    h = lib.tarl_parse_population(pop_path.encode(), net_path.encode())
    if not h:
        return None
    try:
        err = lib.tarl_pop_error(h)
        if err:
            return None
        if lib.tarl_pop_needs_fallback(h):
            return None  # legacy coordinate plans -> Python KDTree path
        n = lib.tarl_pop_num_rows(h)
        rows = np.empty((int(n), 9), np.float32)
        lib.tarl_pop_fill(h, rows)
        stats = np.empty(7, np.int64)
        lib.tarl_pop_stats(h, stats)
        return rows, {
            "total_agents": int(stats[0]),
            "selected_agents": int(stats[1]),
            "car_avail_not_always": int(stats[2]),
            "no_plan": int(stats[3]),
            "too_few_activities": int(stats[4]),
            "no_valid_trip": int(stats[5]),
            "invalid_trip_coords": int(stats[6]),
        }
    finally:
        lib.tarl_pop_free(h)
