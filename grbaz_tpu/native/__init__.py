"""Native (C++) host-runtime components, loaded via ctypes.

The compute path is JAX/XLA; the host runtime around it (network sample
plane, format converters) is C++, mirroring the reference's split
(lib/*.cc for sockets/drivers, SURVEY.md §2.1). Libraries are built
on first use with the system toolchain — no pip/pybind11 required.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading

_DIR = os.path.dirname(os.path.abspath(__file__))
_LOCK = threading.Lock()
_LIBS = {}


def _build(name: str, sources, extra_flags=()):
    so_path = os.path.join(_DIR, f"lib{name}.so")
    srcs = [os.path.join(_DIR, s) for s in sources]
    if os.path.exists(so_path) and all(
            os.path.getmtime(so_path) >= os.path.getmtime(s) for s in srcs):
        return so_path
    # .h/.inc entries are staleness dependencies only, not compile units
    units = [s for s in srcs if not s.endswith((".h", ".inc"))]
    cmd = ["g++", "-O2", "-shared", "-fPIC", "-pthread", "-std=c++17",
           "-o", so_path, *units, *extra_flags]
    subprocess.run(cmd, check=True, capture_output=True)
    return so_path


def load(name: str, sources, extra_flags=()):
    """Build (if stale) and load a native library; cached per process."""
    with _LOCK:
        if name in _LIBS:
            return _LIBS[name]
        so_path = _build(name, sources, extra_flags)
        lib = ctypes.CDLL(so_path)
        _LIBS[name] = lib
        return lib


def load_boripnet():
    lib = load("boripnet", ["boripnet.cc"])
    c = ctypes
    lib.borip_rx_create.restype = c.c_void_p
    lib.borip_rx_create.argtypes = [c.c_uint16, c.c_uint32, c.c_uint32,
                                    c.c_int, c.c_uint32]
    lib.borip_rx_port.restype = c.c_uint16
    lib.borip_rx_port.argtypes = [c.c_void_p]
    lib.borip_rx_read.restype = c.c_int64
    lib.borip_rx_read.argtypes = [c.c_void_p, c.POINTER(c.c_uint8),
                                  c.c_int64, c.POINTER(c.c_uint8)]
    lib.borip_rx_stats.argtypes = [c.c_void_p, c.POINTER(c.c_uint64),
                                   c.POINTER(c.c_uint64),
                                   c.POINTER(c.c_uint64)]
    lib.borip_rx_destroy.argtypes = [c.c_void_p]
    lib.borip_tx_create.restype = c.c_void_p
    lib.borip_tx_create.argtypes = [c.c_char_p, c.c_uint16, c.c_uint32,
                                    c.c_int]
    lib.borip_tx_connect.restype = c.c_int
    lib.borip_tx_connect.argtypes = [c.c_void_p, c.c_char_p, c.c_uint16]
    lib.borip_tx_send.restype = c.c_int64
    lib.borip_tx_send.argtypes = [c.c_void_p, c.POINTER(c.c_uint8),
                                  c.c_int64, c.c_uint8]
    lib.borip_tx_end.restype = c.c_int
    lib.borip_tx_end.argtypes = [c.c_void_p]
    lib.borip_tx_destroy.argtypes = [c.c_void_p]
    lib.borip_rx_ata_info.argtypes = [c.c_void_p, c.POINTER(c.c_double),
                                      c.POINTER(c.c_double),
                                      c.POINTER(c.c_uint64),
                                      c.POINTER(c.c_uint32)]
    lib.borip_tx_ata_meta.argtypes = [c.c_void_p, c.c_double, c.c_double,
                                      c.c_uint32, c.c_uint32, c.c_uint32,
                                      c.c_uint32]
    return lib


def load_tcpframe():
    lib = load("tcpframe", ["tcpframe.cc"])
    c = ctypes
    lib.tcpf_src_create.restype = c.c_void_p
    lib.tcpf_src_create.argtypes = [c.c_uint16, c.c_uint64]
    lib.tcpf_src_port.restype = c.c_uint16
    lib.tcpf_src_port.argtypes = [c.c_void_p]
    lib.tcpf_src_read.restype = c.c_int64
    lib.tcpf_src_read.argtypes = [c.c_void_p, c.POINTER(c.c_uint8),
                                  c.c_int64, c.POINTER(c.c_uint64)]
    lib.tcpf_src_next_tag.restype = c.c_int64
    lib.tcpf_src_next_tag.argtypes = [c.c_void_p, c.POINTER(c.c_uint8),
                                      c.c_int64, c.c_uint64,
                                      c.POINTER(c.c_uint64)]
    lib.tcpf_src_stats.argtypes = [c.c_void_p, c.POINTER(c.c_uint64),
                                   c.POINTER(c.c_uint64),
                                   c.POINTER(c.c_uint64),
                                   c.POINTER(c.c_int), c.POINTER(c.c_int)]
    lib.tcpf_src_destroy.argtypes = [c.c_void_p]
    lib.tcpf_sink_create.restype = c.c_void_p
    lib.tcpf_sink_create.argtypes = [c.c_char_p, c.c_uint16, c.c_int]
    lib.tcpf_sink_send.restype = c.c_int
    lib.tcpf_sink_send.argtypes = [c.c_void_p, c.c_uint8, c.c_uint8,
                                   c.POINTER(c.c_uint8), c.c_uint64]
    lib.tcpf_sink_connected.restype = c.c_int
    lib.tcpf_sink_connected.argtypes = [c.c_void_p]
    lib.tcpf_sink_stats.argtypes = [c.c_void_p, c.POINTER(c.c_uint64),
                                    c.POINTER(c.c_uint64),
                                    c.POINTER(c.c_uint64)]
    lib.tcpf_sink_destroy.argtypes = [c.c_void_p]
    return lib
