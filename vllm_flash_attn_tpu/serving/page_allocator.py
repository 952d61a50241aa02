"""Page allocator: ctypes binding to the C++ core (csrc/page_allocator.cpp).

Built on first use with g++ (cached under ~/.cache). A pure-Python fallback
keeps tests hermetic if no toolchain is present; the C++ path is the
production one (host-side scheduling tick of continuous batching).
"""

from __future__ import annotations

import ctypes
import hashlib
import os
import subprocess
from pathlib import Path

import numpy as np

_SRC = Path(__file__).resolve().parents[2] / "csrc" / "page_allocator.cpp"


def _build_lib() -> ctypes.CDLL | None:
    try:
        src = _SRC.read_text()
    except OSError:
        return None
    tag = hashlib.sha256(src.encode()).hexdigest()[:16]
    cache = Path(
        os.environ.get("XDG_CACHE_HOME", os.path.expanduser("~/.cache"))
    ) / "vllm_flash_attn_tpu"
    cache.mkdir(parents=True, exist_ok=True)
    so = cache / f"page_allocator_{tag}.so"
    if not so.exists():
        try:
            subprocess.run(
                ["g++", "-O2", "-shared", "-fPIC", "-std=c++17",
                 str(_SRC), "-o", str(so)],
                check=True, capture_output=True,
            )
        except (subprocess.CalledProcessError, FileNotFoundError):
            return None
    try:
        lib = ctypes.CDLL(str(so))
    except OSError:
        return None
    lib.pa_create.restype = ctypes.c_void_p
    lib.pa_create.argtypes = [ctypes.c_int32] * 4
    lib.pa_destroy.argtypes = [ctypes.c_void_p]
    lib.pa_num_free_pages.restype = ctypes.c_int32
    lib.pa_num_free_pages.argtypes = [ctypes.c_void_p]
    lib.pa_alloc_seq.restype = ctypes.c_int32
    lib.pa_alloc_seq.argtypes = [ctypes.c_void_p]
    lib.pa_extend.restype = ctypes.c_int32
    lib.pa_extend.argtypes = [ctypes.c_void_p, ctypes.c_int32, ctypes.c_int32]
    lib.pa_shrink.restype = ctypes.c_int32
    lib.pa_shrink.argtypes = [ctypes.c_void_p, ctypes.c_int32, ctypes.c_int32]
    lib.pa_free_seq.argtypes = [ctypes.c_void_p, ctypes.c_int32]
    lib.pa_seq_length.restype = ctypes.c_int32
    lib.pa_seq_length.argtypes = [ctypes.c_void_p, ctypes.c_int32]
    lib.pa_block_table.argtypes = [
        ctypes.c_void_p, ctypes.c_int32, ctypes.POINTER(ctypes.c_int32)
    ]
    lib.pa_gather.argtypes = [
        ctypes.c_void_p, ctypes.POINTER(ctypes.c_int32), ctypes.c_int32,
        ctypes.POINTER(ctypes.c_int32), ctypes.POINTER(ctypes.c_int32),
    ]
    lib.pa_adopt.restype = ctypes.c_int32
    lib.pa_adopt.argtypes = [
        ctypes.c_void_p, ctypes.c_int32, ctypes.POINTER(ctypes.c_int32),
        ctypes.c_int32, ctypes.c_int32,
    ]
    lib.pa_ref_page.restype = ctypes.c_int32
    lib.pa_ref_page.argtypes = [ctypes.c_void_p, ctypes.c_int32]
    lib.pa_unref_page.restype = ctypes.c_int32
    lib.pa_unref_page.argtypes = [ctypes.c_void_p, ctypes.c_int32]
    lib.pa_page_refcount.restype = ctypes.c_int32
    lib.pa_page_refcount.argtypes = [ctypes.c_void_p, ctypes.c_int32]
    return lib


_LIB = None
_LIB_TRIED = False


def _lib():
    global _LIB, _LIB_TRIED
    if not _LIB_TRIED:
        _LIB = _build_lib()
        _LIB_TRIED = True
    return _LIB


class PageAllocator:
    """Page pool + block tables for the paged KV cache (C++ core)."""

    def __init__(self, num_pages: int, max_seqs: int, max_pages_per_seq: int,
                 page_size: int, force_python: bool = False):
        self.num_pages = num_pages
        self.max_seqs = max_seqs
        self.max_pages_per_seq = max_pages_per_seq
        self.page_size = page_size
        self._lib = None if force_python else _lib()
        if self._lib is not None:
            self._h = self._lib.pa_create(
                num_pages, max_seqs, max_pages_per_seq, page_size
            )
        else:  # pure-python fallback
            self._free = list(range(num_pages - 1, -1, -1))
            self._seqs = [[] for _ in range(max_seqs)]
            self._lens = [0] * max_seqs
            self._used = [False] * max_seqs
            self._refs = [0] * num_pages

    @property
    def native(self) -> bool:
        return self._lib is not None

    def __del__(self):
        lib = getattr(self, "_lib", None)
        if lib is not None:
            lib.pa_destroy(self._h)

    def num_free_pages(self) -> int:
        if self._lib:
            return self._lib.pa_num_free_pages(self._h)
        return len(self._free)

    def alloc_seq(self) -> int:
        if self._lib:
            return self._lib.pa_alloc_seq(self._h)
        for s in range(self.max_seqs):
            if not self._used[s]:
                self._used[s] = True
                self._lens[s] = 0
                self._seqs[s] = []
                return s
        return -1

    def extend(self, slot: int, num_tokens: int) -> int:
        """Grow a sequence. Returns the new length, -1 on pool OOM (preemption
        can free pages), or -2 when the per-sequence page cap would be
        exceeded (unrecoverable — caller must finish/reject the sequence).
        State is unchanged on failure."""
        if self._lib:
            return self._lib.pa_extend(self._h, slot, num_tokens)
        if not (0 <= slot < self.max_seqs) or not self._used[slot]:
            return -2
        new_len = self._lens[slot] + num_tokens
        need = -(-new_len // self.page_size) - len(self._seqs[slot])
        if len(self._seqs[slot]) + need > self.max_pages_per_seq:
            return -2
        if need > len(self._free):
            return -1
        for _ in range(need):
            p = self._free.pop()
            self._refs[p] = 1
            self._seqs[slot].append(p)
        self._lens[slot] = new_len
        return new_len

    def _dec_ref(self, p: int) -> None:
        self._refs[p] -= 1
        if self._refs[p] <= 0:
            self._refs[p] = 0
            self._free.append(p)

    def shrink(self, slot: int, num_tokens: int) -> int:
        """Shrink a sequence, returning now-unused pages to the pool.
        Returns the new length (clamped at 0), or -2 for an invalid slot."""
        if self._lib:
            return self._lib.pa_shrink(self._h, slot, num_tokens)
        if not (0 <= slot < self.max_seqs) or not self._used[slot]:
            return -2
        new_len = max(0, self._lens[slot] - num_tokens)
        keep = -(-new_len // self.page_size)
        while len(self._seqs[slot]) > keep:
            self._dec_ref(self._seqs[slot].pop())
        self._lens[slot] = new_len
        return new_len

    def free_seq(self, slot: int) -> None:
        if self._lib:
            self._lib.pa_free_seq(self._h, slot)
            return
        if 0 <= slot < self.max_seqs and self._used[slot]:
            for p in self._seqs[slot]:
                self._dec_ref(p)
            self._seqs[slot] = []
            self._lens[slot] = 0
            self._used[slot] = False

    def seq_length(self, slot: int) -> int:
        if self._lib:
            return self._lib.pa_seq_length(self._h, slot)
        if 0 <= slot < self.max_seqs and self._used[slot]:
            return self._lens[slot]
        return -1

    def adopt(self, slot: int, pages, n_tokens: int) -> int:
        """Attach EXISTING pages (a cached prompt prefix) to a fresh slot:
        refcounts increment and the slot starts at n_tokens (page-covered).
        Returns the new length or -2 (vLLM automatic-prefix-caching
        analog)."""
        pages = np.asarray(pages, dtype=np.int32)
        if self._lib:
            return self._lib.pa_adopt(
                self._h, slot,
                pages.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
                len(pages), n_tokens,
            )
        if not (0 <= slot < self.max_seqs) or not self._used[slot]:
            return -2
        if self._seqs[slot] or self._lens[slot] != 0:
            return -2
        if len(pages) > self.max_pages_per_seq:
            return -2
        if n_tokens > len(pages) * self.page_size:
            return -2
        for i, p in enumerate(pages):
            p = int(p)
            if not (0 <= p < self.num_pages) or self._refs[p] <= 0:
                for q in self._seqs[slot]:
                    self._dec_ref(q)
                self._seqs[slot] = []
                return -2
            self._refs[p] += 1
            self._seqs[slot].append(p)
        self._lens[slot] = n_tokens
        return n_tokens

    def ref_page(self, page: int) -> int:
        """Pin a page on behalf of the prefix-cache table (extra ref)."""
        if self._lib:
            return self._lib.pa_ref_page(self._h, page)
        if not (0 <= page < self.num_pages) or self._refs[page] <= 0:
            return -2
        self._refs[page] += 1
        return self._refs[page]

    def unref_page(self, page: int) -> int:
        """Drop a prefix-cache pin; frees the page at refcount zero."""
        if self._lib:
            return self._lib.pa_unref_page(self._h, page)
        if not (0 <= page < self.num_pages) or self._refs[page] <= 0:
            return -2
        self._dec_ref(page)
        return self._refs[page]

    def page_refcount(self, page: int) -> int:
        if self._lib:
            return self._lib.pa_page_refcount(self._h, page)
        if not (0 <= page < self.num_pages):
            return -2
        return self._refs[page]

    def gather(self, slots) -> tuple[np.ndarray, np.ndarray]:
        """Batched (block_tables (n, max_pages) int32, lengths (n,) int32)."""
        slots = np.asarray(slots, dtype=np.int32)
        n = len(slots)
        tables = np.zeros((n, self.max_pages_per_seq), dtype=np.int32)
        lens = np.zeros((n,), dtype=np.int32)
        if self._lib:
            self._lib.pa_gather(
                self._h,
                slots.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
                n,
                tables.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
                lens.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
            )
            return tables, lens
        for i, s in enumerate(slots):
            L = self.seq_length(int(s))
            if L > 0:
                pages = self._seqs[int(s)]
                tables[i, : len(pages)] = pages
                lens[i] = L
        return tables, lens
