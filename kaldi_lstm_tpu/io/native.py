"""ctypes bindings to the native I/O library (native/kltio.cc).

Zero-copy ark access: Python mmaps the ark, C++ scans record offsets, and
tensors are numpy views into the mapping. Auto-builds the .so with the
repo Makefile when missing; every caller must handle `get_lib()` returning
None (pure-Python fallback paths stay in kaldi_io.py).
"""

from __future__ import annotations

import ctypes
import mmap
import os
import subprocess
import threading
from typing import Optional

import numpy as np

_LIB: Optional[ctypes.CDLL] = None
_TRIED = False
_INIT_LOCK = threading.Lock()


def _native_dir() -> str:
    return os.path.join(os.path.dirname(os.path.dirname(
        os.path.dirname(os.path.abspath(__file__)))), "native")


def get_lib() -> Optional[ctypes.CDLL]:
    # double-checked module lock: worker threads (decode --num-threads)
    # racing the first call must BLOCK until the build/dlopen finishes,
    # not observe _TRIED=True with _LIB still None and silently fall
    # back to the slower Python paths for their utterances
    if _TRIED:
        return _LIB
    with _INIT_LOCK:
        return _get_lib_locked()


def _get_lib_locked() -> Optional[ctypes.CDLL]:
    global _LIB, _TRIED
    if _TRIED:
        return _LIB
    try:
        _LIB = _load()
    finally:
        # only flipped once _LIB is final — the unlocked fast path in
        # get_lib() reads (_TRIED, _LIB) without the lock
        _TRIED = True
    return _LIB


def _load() -> Optional[ctypes.CDLL]:
    so = os.path.join(_native_dir(), "libkltio.so")
    # let make check freshness (no-op when the .so is newer than the
    # sources) so a stale binary cannot silently shadow edited source;
    # the binary is NOT committed — fresh checkouts build on first use.
    # The build AND the dlopen run under an exclusive file lock so
    # concurrent process startups (multi-host launch, pytest-xdist)
    # neither race the linker nor load a half-written .so.
    lock = None
    try:
        import fcntl
        lock = open(os.path.join(_native_dir(), ".build.lock"), "a+")
        fcntl.flock(lock, fcntl.LOCK_EX)
    except Exception:
        lock = None  # read-only dir: single-process semantics anyway
    try:
        try:
            subprocess.run(["make", "-C", _native_dir()], check=True,
                           capture_output=True, timeout=120)
        except Exception as e:
            if not os.path.exists(so):  # no prebuilt .so to fall back on
                return None
            import sys
            print(f"WARNING: native rebuild failed ({e!r}); using the "
                  f"existing {so} which may be STALE", file=sys.stderr)
        try:
            lib = ctypes.CDLL(so)
        except OSError:
            return None
    finally:
        if lock is not None:
            try:
                import fcntl
                fcntl.flock(lock, fcntl.LOCK_UN)
            except Exception:
                pass
            lock.close()

    L = ctypes.c_long
    I = ctypes.c_int
    PL = ctypes.POINTER(L)
    PI = ctypes.POINTER(I)
    PF = ctypes.POINTER(ctypes.c_float)
    lib.klt_scan_matrix_ark.restype = L
    lib.klt_scan_matrix_ark.argtypes = [
        ctypes.c_char_p, L, L, PL, PI, PL, PI, PI]
    lib.klt_scan_posterior_ark.restype = L
    lib.klt_scan_posterior_ark.argtypes = [
        ctypes.c_char_p, L, I, L, L, PL, PI, PL, PI, PI, PF]
    lib.klt_fill_stream.restype = L
    lib.klt_fill_stream.argtypes = [
        L, L, L, L, PF, L, PI, PF, L, PF, PI, PF, PF]
    P64 = ctypes.POINTER(ctypes.c_int64)
    lib.klt_fill_batch.restype = L
    lib.klt_fill_batch.argtypes = [
        L, L, L, L, L, P64, P64, P64, P64, P64, PF, PI, PF, PF]
    PD = ctypes.POINTER(ctypes.c_double)
    D = ctypes.c_double
    try:
        lib.klt_decode_faster.restype = ctypes.c_int64
        lib.klt_decode_faster.argtypes = [
            ctypes.c_int64, ctypes.c_int64, ctypes.c_int64,
            P64, PI, PI, PD, ctypes.c_int64,
            P64, PI, PD,
            PD, D, D, ctypes.c_int64, ctypes.c_int64, PD, PI]
    except AttributeError:
        pass  # stale prebuilt .so in a read-only env; decoder falls back
    try:
        lib.klt_decode_faster_sparse.restype = ctypes.c_int64
        lib.klt_decode_faster_sparse.argtypes = [
            ctypes.c_int64, ctypes.c_int64, ctypes.c_int64,
            P64, PI, PI, PD, ctypes.c_int64,
            P64, PI, PD,
            PI, PI, PI, PI, PI,
            PD, D, D, ctypes.c_int64, ctypes.c_int64, PD,
            PD, PI, PI, ctypes.c_int64, PI]
    except AttributeError:
        pass  # stale prebuilt .so; large-graph decode uses dense path
    try:
        lib.klt_stream_new.restype = ctypes.c_void_p
        lib.klt_stream_new.argtypes = [
            ctypes.c_int64, P64, PI, PI, PD,
            ctypes.c_int64, P64, PI, PD,
            D, D, ctypes.c_int64, ctypes.c_int64, PI]
        lib.klt_stream_advance.restype = ctypes.c_int64
        lib.klt_stream_advance.argtypes = [
            ctypes.c_void_p, PD, ctypes.c_int64, ctypes.c_int64, PI]
        lib.klt_stream_alpha.restype = None
        lib.klt_stream_alpha.argtypes = [ctypes.c_void_p, PD]
        lib.klt_stream_free.restype = None
        lib.klt_stream_free.argtypes = [ctypes.c_void_p]
    except AttributeError:
        pass  # stale prebuilt .so; online decoder falls back to numpy
    try:
        lib.klt_decode_lattice.restype = ctypes.c_int64
        lib.klt_decode_lattice.argtypes = [
            ctypes.c_int64, ctypes.c_int64, ctypes.c_int64,
            P64, PI, PI, PD, ctypes.c_int64,
            P64, PI, PD,
            PD, D, D, ctypes.c_int64, ctypes.c_int64,
            PD, P64, ctypes.c_int64, P64, P64, ctypes.c_int64, P64]
    except AttributeError:
        pass
    try:
        lib.klt_decode_lattice2.restype = ctypes.c_int64
        lib.klt_decode_lattice2.argtypes = [
            ctypes.c_int64, ctypes.c_int64, ctypes.c_int64,
            P64, PI, PI, PD, ctypes.c_int64,
            P64, PI, PD,
            PD, D, D, ctypes.c_int64, ctypes.c_int64,
            PI, PD, ctypes.c_int64, P64,
            P64, ctypes.c_int64, P64, P64, ctypes.c_int64, P64]
    except AttributeError:
        pass
    return lib


def _ptr(a: np.ndarray, ctype):
    return a.ctypes.data_as(ctypes.POINTER(ctype))


def scan_matrix_ark(path: str):
    """-> list[(key, np.ndarray view [rows, cols])] or None if the native
    lib is unavailable. Views alias the file mapping (read-only)."""
    lib = get_lib()
    if lib is None:
        return None
    with open(path, "rb") as f:
        size = os.fstat(f.fileno()).st_size
        if size == 0:
            return []
        mm = mmap.mmap(f.fileno(), 0, access=mmap.ACCESS_READ)
    buf = np.frombuffer(mm, np.uint8)
    cap = max(16, size // 64)  # records are >= ~64 bytes in practice
    while True:
        key_off = np.zeros(cap, np.int64)
        key_len = np.zeros(cap, np.int32)
        data_off = np.zeros(cap, np.int64)
        rows = np.zeros(cap, np.int32)
        cols = np.zeros(cap, np.int32)
        n = lib.klt_scan_matrix_ark(
            ctypes.c_char_p(buf.ctypes.data), size, cap,
            _ptr(key_off, ctypes.c_long), _ptr(key_len, ctypes.c_int),
            _ptr(data_off, ctypes.c_long), _ptr(rows, ctypes.c_int),
            _ptr(cols, ctypes.c_int))
        if n == -2:
            cap *= 4
            continue
        if n < 0:
            raise ValueError(f"malformed matrix ark: {path}")
        break
    out = []
    raw = mm
    for i in range(n):
        key = bytes(raw[key_off[i]:key_off[i] + key_len[i]]).decode()
        mat = np.frombuffer(
            raw, np.float32, count=int(rows[i]) * int(cols[i]),
            offset=int(data_off[i])).reshape(int(rows[i]), int(cols[i]))
        out.append((key, mat))
    return out


def scan_posterior_ark(path: str, max_entries: int = 1):
    """-> dict key -> (ids [T, K] int32, weights [T, K] float32), or None
    if the native lib is unavailable."""
    lib = get_lib()
    if lib is None:
        return None
    with open(path, "rb") as f:
        data = f.read()
    size = len(data)
    if size == 0:
        return {}
    cap_rec = max(16, size // 32)
    # phase 1: count (retry with larger record capacity on -2, like
    # scan_matrix_ark — short-key/few-frame arks exceed the heuristic)
    while True:
        key_off = np.zeros(cap_rec, np.int64)
        key_len = np.zeros(cap_rec, np.int32)
        frame_off = np.zeros(cap_rec, np.int64)
        num_frames = np.zeros(cap_rec, np.int32)
        n = lib.klt_scan_posterior_ark(
            data, size, max_entries, cap_rec, 1 << 62,
            _ptr(key_off, ctypes.c_long), _ptr(key_len, ctypes.c_int),
            _ptr(frame_off, ctypes.c_long), _ptr(num_frames, ctypes.c_int),
            None, None)
        if n == -2:
            cap_rec *= 4
            continue
        if n < 0:
            raise ValueError(f"malformed posterior ark: {path}")
        break
    total = int(frame_off[n - 1] + num_frames[n - 1]) if n > 0 else 0
    ids = np.zeros((total, max_entries), np.int32)
    weights = np.zeros((total, max_entries), np.float32)
    n2 = lib.klt_scan_posterior_ark(
        data, size, max_entries, cap_rec, total,
        _ptr(key_off, ctypes.c_long), _ptr(key_len, ctypes.c_int),
        _ptr(frame_off, ctypes.c_long), _ptr(num_frames, ctypes.c_int),
        _ptr(ids, ctypes.c_int), _ptr(weights, ctypes.c_float))
    assert n2 == n
    out = {}
    for i in range(n):
        key = data[key_off[i]:key_off[i] + key_len[i]].decode()
        a = int(frame_off[i])
        b = a + int(num_frames[i])
        out[key] = (ids[a:b], weights[a:b])
    return out


def decode_faster_sparse_native(ns: int, em_ptr, em_dst, em_pdf, em_w,
                                em_src, em_word, em_tid,
                                eps_ptr, eps_dst, eps_w,
                                eps_src, eps_word,
                                loglik: np.ndarray, final_w: np.ndarray,
                                acoustic_scale: float, beam: float,
                                max_active: int, start: int):
    """Large-graph Viterbi decode with SPARSE backpointers + in-C++
    traceback (native/kltdecode.cc klt_decode_faster_sparse): memory is
    O(T * active) instead of the dense path's O(T * num_states)
    (3.6 GB/utterance at 1.5M states). Returns
    (words int32[], tids int32[], score, reached) or None when
    unavailable."""
    lib = get_lib()
    if lib is None or not hasattr(lib, "klt_decode_faster_sparse"):
        return None
    T, K = loglik.shape
    score = np.empty(1, np.float64)
    reached = np.empty(1, np.int32)
    tids = np.empty(T, np.int32)
    cap = 4 * T + 64
    for _ in range(4):
        words = np.empty(cap, np.int32)
        rc = lib.klt_decode_faster_sparse(
            ns, T, K,
            _ptr(em_ptr, ctypes.c_int64), _ptr(em_dst, ctypes.c_int),
            _ptr(em_pdf, ctypes.c_int), _ptr(em_w, ctypes.c_double),
            len(em_dst),
            _ptr(eps_ptr, ctypes.c_int64), _ptr(eps_dst, ctypes.c_int),
            _ptr(eps_w, ctypes.c_double),
            _ptr(em_src, ctypes.c_int), _ptr(em_word, ctypes.c_int),
            _ptr(em_tid, ctypes.c_int),
            _ptr(eps_src, ctypes.c_int), _ptr(eps_word, ctypes.c_int),
            _ptr(loglik, ctypes.c_double), float(acoustic_scale),
            float(beam), int(max_active), int(start),
            _ptr(final_w, ctypes.c_double),
            _ptr(score, ctypes.c_double), _ptr(reached, ctypes.c_int),
            _ptr(words, ctypes.c_int), cap, _ptr(tids, ctypes.c_int))
        if rc == -1000001:
            cap *= 8
            continue
        if rc == -1000000:
            raise RuntimeError(
                "decode_faster: broken backpointer chain (sparse)")
        if rc < 0:
            raise RuntimeError(
                f"decode_faster: no tokens survived at frame {-rc - 1} "
                "— beam too tight or loglik/graph mismatch")
        return (words[:rc], tids, float(score[0]), bool(reached[0]))
    raise RuntimeError("decode_faster: word path exceeds capacity")


def decode_faster_native(ns: int, em_ptr, em_dst, em_pdf, em_w,
                         eps_ptr, eps_dst, eps_w, loglik: np.ndarray,
                         acoustic_scale: float, beam: float,
                         max_active: int, start: int):
    """Whole-utterance Viterbi beam search in C++ (native/kltdecode.cc).

    Returns (alpha [ns] float64, bps [(T+1), ns] int32) or None when the
    native lib is unavailable; raises RuntimeError when no token
    survives a frame (same condition as the Python path).
    """
    lib = get_lib()
    if lib is None or not hasattr(lib, "klt_decode_faster"):
        return None
    T, K = loglik.shape
    alpha = np.empty(ns, np.float64)
    bps = np.empty((T + 1, ns), np.int32)
    rc = lib.klt_decode_faster(
        ns, T, K,
        _ptr(em_ptr, ctypes.c_int64), _ptr(em_dst, ctypes.c_int),
        _ptr(em_pdf, ctypes.c_int), _ptr(em_w, ctypes.c_double),
        len(em_dst),
        _ptr(eps_ptr, ctypes.c_int64), _ptr(eps_dst, ctypes.c_int),
        _ptr(eps_w, ctypes.c_double),
        _ptr(loglik, ctypes.c_double), float(acoustic_scale), float(beam),
        int(max_active), int(start),
        _ptr(alpha, ctypes.c_double), _ptr(bps, ctypes.c_int))
    if rc < 0:
        raise RuntimeError(
            f"decode_faster: no tokens survived at frame {-rc - 1} — "
            "beam too tight or loglik/graph mismatch")
    return alpha, bps


def decode_lattice_native(ns: int, em_ptr, em_dst, em_pdf, em_w,
                          eps_ptr, eps_dst, eps_w, em: np.ndarray,
                          beam: float, lattice_beam: float,
                          max_active: int, start: int):
    """Lattice-generating forward pass in C++ (native/kltdecode.cc).

    `em` is the pre-scaled [T, K] float64 emission matrix. Returns
    (alphas [(T+1), ns], em_kept per-frame id arrays, eps_kept
    per-level id arrays) or None when unavailable; raises RuntimeError
    when no token survives a frame.
    """
    lib = get_lib()
    if lib is None or not hasattr(lib, "klt_decode_lattice"):
        return None
    T, K = em.shape
    alphas = np.empty((T + 1, ns), np.float64)
    em_out_ptr = np.zeros(T + 1, np.int64)
    eps_out_ptr = np.zeros(T + 2, np.int64)
    em_cap, eps_cap = 64 * T + 4096, 64 * (T + 2) + 4096
    while True:
        em_ids = np.empty(em_cap, np.int64)
        eps_ids = np.empty(eps_cap, np.int64)
        rc = lib.klt_decode_lattice(
            ns, T, K,
            _ptr(em_ptr, ctypes.c_int64), _ptr(em_dst, ctypes.c_int),
            _ptr(em_pdf, ctypes.c_int), _ptr(em_w, ctypes.c_double),
            len(em_dst),
            _ptr(eps_ptr, ctypes.c_int64), _ptr(eps_dst, ctypes.c_int),
            _ptr(eps_w, ctypes.c_double),
            _ptr(em, ctypes.c_double), float(beam), float(lattice_beam),
            int(max_active), int(start),
            _ptr(alphas, ctypes.c_double),
            _ptr(em_ids, ctypes.c_int64), em_cap,
            _ptr(em_out_ptr, ctypes.c_int64),
            _ptr(eps_ids, ctypes.c_int64), eps_cap,
            _ptr(eps_out_ptr, ctypes.c_int64))
        if rc == 1:  # capacity exceeded; ptr arrays carry true counts
            em_cap = max(em_cap, int(em_out_ptr[T]) + 1)
            eps_cap = max(eps_cap, int(eps_out_ptr[T + 1]) + 1)
            continue
        if rc < 0:
            raise RuntimeError(
                f"decode_lattice_faster: no tokens survived at frame "
                f"{-rc - 1} — beam too tight or loglik/graph mismatch")
        break
    em_kept = [em_ids[em_out_ptr[t]:em_out_ptr[t + 1]].copy()
               for t in range(T)]
    eps_kept = [eps_ids[eps_out_ptr[l]:eps_out_ptr[l + 1]].copy()
                for l in range(T + 1)]
    return alphas, em_kept, eps_kept


class SparseAlphas:
    """Per-level sparse alpha snapshots from klt_decode_lattice2:
    `self[level]` returns a lookup object supporting fancy indexing
    (searchsorted over the level's SORTED state ids; absent states
    read as NEG). Drop-in for the dense [(T+1), ns] table in
    decode_lattice_faster's backward pruning, which only reads alpha
    at recorded-arc endpoints."""

    NEG = -1e30

    class _Level:
        __slots__ = ("states", "vals")

        def __init__(self, states, vals):
            self.states = states
            self.vals = vals

        def __getitem__(self, idx):
            idx = np.asarray(idx)
            pos = np.searchsorted(self.states, idx)
            pos_c = np.minimum(pos, len(self.states) - 1) \
                if len(self.states) else pos * 0
            out = np.full(idx.shape, SparseAlphas.NEG)
            if len(self.states):
                hit = self.states[pos_c] == idx
                out[hit] = self.vals[pos_c[hit]]
            return out

        def to_dense(self, ns: int) -> np.ndarray:
            d = np.full(ns, SparseAlphas.NEG)
            d[self.states] = self.vals
            return d

    def __init__(self, states, vals, lvl_ptr):
        self._states = states
        self._vals = vals
        self._ptr = lvl_ptr

    def __getitem__(self, level: int):
        a, b = int(self._ptr[level]), int(self._ptr[level + 1])
        return self._Level(self._states[a:b], self._vals[a:b])


def decode_lattice2_native(ns: int, em_ptr, em_dst, em_pdf, em_w,
                           eps_ptr, eps_dst, eps_w, em: np.ndarray,
                           beam: float, lattice_beam: float,
                           max_active: int, start: int):
    """Sparse-alpha lattice forward (klt_decode_lattice2): the dense
    [(T+1), ns] snapshot table cost ~7 s/utterance of page-fault fill
    at 576k states (KLT_LATGEN_PROF) against 5 ms of search. Returns
    (SparseAlphas, em_kept, eps_kept) or None when unavailable."""
    lib = get_lib()
    if lib is None or not hasattr(lib, "klt_decode_lattice2"):
        return None
    T, K = em.shape
    em_out_ptr = np.zeros(T + 1, np.int64)
    eps_out_ptr = np.zeros(T + 2, np.int64)
    alev_ptr = np.zeros(T + 2, np.int64)
    em_cap, eps_cap = 64 * T + 4096, 64 * (T + 2) + 4096
    alev_cap = (T + 2) * max(1024, 2 * max_active if max_active else 8192)
    while True:
        em_ids = np.empty(em_cap, np.int64)
        eps_ids = np.empty(eps_cap, np.int64)
        alev_states = np.empty(alev_cap, np.int32)
        alev_vals = np.empty(alev_cap, np.float64)
        rc = lib.klt_decode_lattice2(
            ns, T, K,
            _ptr(em_ptr, ctypes.c_int64), _ptr(em_dst, ctypes.c_int),
            _ptr(em_pdf, ctypes.c_int), _ptr(em_w, ctypes.c_double),
            len(em_dst),
            _ptr(eps_ptr, ctypes.c_int64), _ptr(eps_dst, ctypes.c_int),
            _ptr(eps_w, ctypes.c_double),
            _ptr(em, ctypes.c_double), float(beam), float(lattice_beam),
            int(max_active), int(start),
            _ptr(alev_states, ctypes.c_int),
            _ptr(alev_vals, ctypes.c_double), alev_cap,
            _ptr(alev_ptr, ctypes.c_int64),
            _ptr(em_ids, ctypes.c_int64), em_cap,
            _ptr(em_out_ptr, ctypes.c_int64),
            _ptr(eps_ids, ctypes.c_int64), eps_cap,
            _ptr(eps_out_ptr, ctypes.c_int64))
        if rc == 1:  # capacity exceeded; ptr arrays carry true counts
            em_cap = max(em_cap, int(em_out_ptr[T]) + 1)
            eps_cap = max(eps_cap, int(eps_out_ptr[T + 1]) + 1)
            alev_cap = max(alev_cap, int(alev_ptr[T + 1]) + 1)
            continue
        if rc < 0:
            raise RuntimeError(
                f"decode_lattice_faster: no tokens survived at frame "
                f"{-rc - 1} — beam too tight or loglik/graph mismatch")
        break
    em_kept = [em_ids[em_out_ptr[t]:em_out_ptr[t + 1]].copy()
               for t in range(T)]
    eps_kept = [eps_ids[eps_out_ptr[l]:eps_out_ptr[l + 1]].copy()
                for l in range(T + 1)]
    n = int(alev_ptr[T + 1])
    return (SparseAlphas(alev_states[:n].copy(), alev_vals[:n].copy(),
                         alev_ptr.copy()),
            em_kept, eps_kept)


class NativeStreamSession:
    """Persistent native Viterbi search state for the online decoder
    (native/kltdecode.cc klt_stream_*). Holds references to the graph
    CSR arrays for the session lifetime (the C side stores raw
    pointers). `em` chunks passed to advance must be PRE-SCALED
    (construct with acoustic_scale folded in, like OnlineDecoder)."""

    def __init__(self, ns: int, em_ptr, em_dst, em_pdf, em_w,
                 eps_ptr, eps_dst, eps_w, beam: float,
                 max_active: int, start: int):
        lib = get_lib()
        if lib is None or not hasattr(lib, "klt_stream_new"):
            raise RuntimeError("native stream decoder unavailable")
        self._lib = lib
        self.ns = int(ns)
        # keep the arrays alive (C keeps raw pointers)
        self._refs = (em_ptr, em_dst, em_pdf, em_w,
                      eps_ptr, eps_dst, eps_w)
        self.bp0 = np.empty(self.ns, np.int32)
        self._h = lib.klt_stream_new(
            self.ns, _ptr(em_ptr, ctypes.c_int64),
            _ptr(em_dst, ctypes.c_int), _ptr(em_pdf, ctypes.c_int),
            _ptr(em_w, ctypes.c_double), len(em_dst),
            _ptr(eps_ptr, ctypes.c_int64), _ptr(eps_dst, ctypes.c_int),
            _ptr(eps_w, ctypes.c_double),
            1.0, float(beam), int(max_active), int(start),
            _ptr(self.bp0, ctypes.c_int))
        self._frames = 0

    def advance(self, em: np.ndarray) -> np.ndarray:
        """em: [T, K] float64 pre-scaled log-likelihoods. Returns the
        [T, ns] backpointer rows for these frames."""
        em = np.ascontiguousarray(em, np.float64)
        T, K = em.shape
        bps = np.empty((T, self.ns), np.int32)
        rc = self._lib.klt_stream_advance(
            self._h, _ptr(em, ctypes.c_double), T, K,
            _ptr(bps, ctypes.c_int))
        if rc < 0:
            raise RuntimeError(
                f"online decode: no tokens survived at frame "
                f"{self._frames + (-rc - 1)} — beam too tight or "
                "loglik/graph mismatch")
        self._frames += T
        return bps

    def alpha(self) -> np.ndarray:
        out = np.empty(self.ns, np.float64)
        self._lib.klt_stream_alpha(self._h, _ptr(out, ctypes.c_double))
        return out

    def close(self) -> None:
        if getattr(self, "_h", None):
            self._lib.klt_stream_free(self._h)
            self._h = None

    def __del__(self):
        try:
            self.close()
        except Exception:
            pass


def fill_batch(T: int, delay: int, feats_p: np.ndarray, ids_p: np.ndarray,
               w_p: np.ndarray, lent: np.ndarray, curt: np.ndarray,
               D: int, K: int,
               out_feats: np.ndarray, out_ids: np.ndarray,
               out_w: np.ndarray, out_mask: np.ndarray) -> bool:
    """Fill the whole [S, T] batch in ONE native call. `feats_p/ids_p/w_p`
    are int64 arrays of raw data pointers (0 = dry stream, rows zeroed);
    `curt` [S] int64 is updated in place. Returns False without the
    native lib."""
    lib = get_lib()
    if lib is None:
        return False
    S = curt.shape[0]
    p64 = ctypes.c_int64
    lib.klt_fill_batch(
        S, T, D, K, delay, _ptr(feats_p, p64), _ptr(ids_p, p64),
        _ptr(w_p, p64), _ptr(lent, p64), _ptr(curt, p64),
        _ptr(out_feats, ctypes.c_float), _ptr(out_ids, ctypes.c_int),
        _ptr(out_w, ctypes.c_float), _ptr(out_mask, ctypes.c_float))
    return True


def fill_stream(T: int, delay: int, feats: np.ndarray, tgt_ids: np.ndarray,
                tgt_w: np.ndarray, curt: int, out_feats: np.ndarray,
                out_ids: np.ndarray, out_w: np.ndarray,
                out_mask: np.ndarray) -> Optional[int]:
    """One stream's [T] batch rows; returns new curt, or None without the
    native lib. Arrays must be C-contiguous float32/int32."""
    lib = get_lib()
    if lib is None:
        return None
    lent, D = feats.shape
    K = tgt_ids.shape[1]
    return int(lib.klt_fill_stream(
        T, D, K, delay,
        _ptr(feats, ctypes.c_float), lent,
        _ptr(tgt_ids, ctypes.c_int), _ptr(tgt_w, ctypes.c_float), curt,
        _ptr(out_feats, ctypes.c_float), _ptr(out_ids, ctypes.c_int),
        _ptr(out_w, ctypes.c_float), _ptr(out_mask, ctypes.c_float)))
