'''Host-memory tuning for the input pipeline's large buffers.

On virtualized 1-vCPU hosts the streaming input path is bound not by
memcpy but by *page-fault service*: first-touch of fresh anonymous memory
measured ~45 us per 4 KiB page here (0.07 GB/s!), so a 31 MB exam decode
buffer cost ~340 ms of faults against ~11 ms of actual decode. Two fixes,
both measured on this host (tools/bench_host_pipeline.py):

- ``madvise(MADV_HUGEPAGE)`` on buffers >= a few MB before first touch:
  2 MiB THP faults replace 512 base-page faults — first-touch write speed
  0.07 -> ~1.5 GB/s (20x).
- ``mallopt(M_MMAP_THRESHOLD, big)``: stop glibc from handing every large
  buffer back to the kernel on free (munmap) only to re-fault it on the
  next allocation; recycled arena pages fault once, ever.

Both are best-effort: on a non-glibc libc or denied madvise the helpers
quietly do nothing. Opt out with DNNCA_NO_MALLOC_TUNE=1.

The reference leans on tf.data's C++ runtime for the same problem class
(reference annotator/data.py:448-512); this module is the host-runtime
half of that role for the TPU pipeline.
'''

import ctypes
import os

import numpy as np

_MADV_HUGEPAGE = 14
_M_TRIM_THRESHOLD = -1
_M_MMAP_THRESHOLD = -3
_PAGE = 4096

_libc = None
_malloc_tuned = False


def _lib():
    global _libc
    if _libc is None:
        try:
            _libc = ctypes.CDLL(None, use_errno=True)
        except Exception:
            _libc = False
    return _libc or None


def tune_malloc(threshold=256 << 20):
    '''Raise glibc's mmap/trim thresholds so large pipeline buffers are
    recycled in-arena instead of munmapped and re-faulted. Idempotent.'''
    global _malloc_tuned
    if _malloc_tuned or os.environ.get('DNNCA_NO_MALLOC_TUNE') == '1':
        return
    _malloc_tuned = True
    lib = _lib()
    if lib is None or not hasattr(lib, 'mallopt'):
        return
    try:
        lib.mallopt(_M_MMAP_THRESHOLD, int(threshold))
        lib.mallopt(_M_TRIM_THRESHOLD, int(threshold))
    except Exception:
        pass


def madvise_hugepage(arr):
    '''Mark a numpy array's pages for transparent hugepages (best-effort;
    call BEFORE first touch — faults then map 2 MiB pages directly).'''
    lib = _lib()
    if lib is None or not hasattr(lib, 'madvise'):
        return False
    addr = arr.ctypes.data
    start = (addr + _PAGE - 1) // _PAGE * _PAGE
    end = (addr + arr.nbytes) // _PAGE * _PAGE
    if end <= start:
        return False
    try:
        return lib.madvise(ctypes.c_void_p(start),
                           ctypes.c_size_t(end - start),
                           _MADV_HUGEPAGE) == 0
    except Exception:
        return False


def hugepage_empty(shape, dtype=np.uint8):
    '''np.empty whose pages fault as hugepages when the buffer is large
    enough to matter (>= 4 MiB).'''
    arr = np.empty(shape, dtype)
    if arr.nbytes >= 4 << 20:
        madvise_hugepage(arr)
    return arr
