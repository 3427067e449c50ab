'''Exam ingestion: directory-tree parsing and TFRecord generation.

Parity with the reference ingestion layer (reference: annotator/data.py):

- Directory layout ``path/{cancer,healthy}/patientID/examID/<slice_type>/*.png``
  (data.py module docstring).
- ``parse_exam`` (data.py:353-426): per-type slice decode; healthy exams get a
  synthesized all-zero label shaped like TRA (data.py:417-421).
- ``prepare_combined_slices`` (data.py:318-344): intersect slice IDs across
  types, validate shape variance <= 0.7% (data.py:325-333), crop everything to
  the min shape, stack into [S, H, W, C] uint8.
- ``generate_tfrecords`` (data.py:218-298): center-crop to ``output_size`` and
  serialize Example{slices, patientID, examID, path, category, shape,
  slice_types} to a single .tfrecords file.

Difference from the reference: slice IDs are iterated in sorted order (the
reference iterates Python-set order, which is nondeterministic).
'''

import io
import logging
import os
from glob import glob

import numpy as np

from . import tfrecord as tfr
from ..utils import hostmem

DEFAULT_SLICE_TYPES = ('TRA', 'ADC', 'DWI', 'DCEE', 'DCEL', 'label')

# large decode/crop buffers churn constantly in the streaming input path;
# recycle them in-arena instead of re-faulting fresh pages every exam
hostmem.tune_malloc()


def _decode_image_gray(path):
    '''Decode an image file to [H, W] uint8 (first channel).'''
    from PIL import Image
    with Image.open(path) as img:
        arr = np.asarray(img)
    if arr.ndim == 3:
        arr = arr[:, :, 0]
    return arr.astype(np.uint8)


def get_category_from_exam_path(exam_dir):
    category = os.path.normpath(exam_dir).split(os.path.sep)[-3]
    assert category in ('healthy', 'cancer'), \
        f'Unknown category {category}: {exam_dir}'
    return category


def get_id_from_exam_path(exam_path):
    patient_id, exam_id = map(int, os.path.normpath(
        exam_path).strip(os.path.sep).split(os.path.sep)[-2:])
    return patient_id, exam_id


def parse_exam(exam_dir, slice_types=DEFAULT_SLICE_TYPES, decoder=None):
    '''Parse one exam directory into {category, path, IDs, per-type slices}.'''
    decoder = decoder or _decode_image_gray
    result = {'path': exam_dir}
    result['category'] = get_category_from_exam_path(exam_dir)
    result['patientID'], result['examID'] = get_id_from_exam_path(exam_dir)

    if result['category'] == 'cancer':
        slices_per_type = {
            t: set(os.listdir(os.path.join(exam_dir, t))) for t in slice_types}
    else:
        slices_per_type = {
            t: set(os.listdir(os.path.join(exam_dir, t)))
            for t in slice_types if t != 'label'}
        if 'label' in slice_types:
            slices_per_type['label'] = slices_per_type['TRA']

    common = set.intersection(*(
        set(os.path.splitext(n)[0] for n in names)
        for names in slices_per_type.values()))
    assert common, f'Not enough slices in {exam_dir}'
    result['nslices'] = len(common)

    stem_to_name = {
        t: {os.path.splitext(n)[0]: n for n in names}
        for t, names in slices_per_type.items()}

    for t in slice_types:
        if t == 'label' and result['category'] == 'healthy':
            result[t] = {
                stem: np.zeros_like(
                    decoder(os.path.join(exam_dir, 'TRA', stem_to_name['TRA'][stem])))
                for stem in sorted(common)}
        else:
            result[t] = {
                stem: decoder(os.path.join(exam_dir, t, stem_to_name[t][stem]))
                for stem in sorted(common)}
    return result


def prepare_combined_slices(exam_dir, slice_types=DEFAULT_SLICE_TYPES,
                            shape_variance_tolerance=0.007):
    '''Stack one exam into [S, H, W, C] uint8 with metadata.'''
    exam = parse_exam(exam_dir, slice_types=slice_types)
    slice_names = sorted(exam[slice_types[0]].keys())

    shapes = np.stack([
        exam[t][s].shape for t in slice_types for s in slice_names], 0)
    shape_min = shapes.min(0)
    shape_diff = (shapes.max(0) - shape_min) / shapes.mean(0)
    if shape_diff.max() > shape_variance_tolerance:
        raise ValueError(
            'Shape of input image differs greatly.\n'
            f'Exam: {exam_dir}\nShapes: {shapes}')

    slices = np.stack([
        np.stack([exam[t][s][:shape_min[0], :shape_min[1]]
                  for t in slice_types], axis=-1)
        for s in slice_names])
    return dict(
        slices=slices,
        category=exam['category'],
        patientID=exam['patientID'],
        examID=exam['examID'],
        path=exam['path'],
    )


def center_crop_np(image, output_size):
    '''Center-crop trailing-2-of-3 spatial dims of [..., H, W, C].'''
    h, w = image.shape[-3], image.shape[-2]
    th, tw = output_size
    top, left = (h - th) // 2, (w - tw) // 2
    return image[..., top:top + th, left:left + tw, :]


def generate_tfrecords(
    path,
    output,
    category=None,
    slice_types=DEFAULT_SLICE_TYPES,
    output_size=(512, 512),
):
    '''
    Generate a TFRecords file from an extracted exam directory tree.

    Args:
        path: path to the data directory, structured as
            path/{healthy,cancer}/patientID/examID/<slice_type>/<sliceID>.png
        output: output .tfrecords path
        category (str): category to include (e.g. cancer or healthy);
            default (None) includes all
        slice_types (list[str]): list of slice types to include
    '''
    slice_types = tuple(slice_types)
    pattern = os.path.join(path, *'*' * 3)
    exams = sorted(glob(pattern))
    out_dir = os.path.dirname(output)
    if out_dir:
        os.makedirs(out_dir, exist_ok=True)
    written = 0
    with open(output, 'wb') as f:
        for exam_dir in exams:
            exam = prepare_combined_slices(exam_dir, slice_types=slice_types)
            if category is not None and exam['category'] != category:
                continue
            slices = center_crop_np(exam['slices'], output_size)
            example = tfr.encode_example({
                'slices': tfr.serialize_tensor(slices),
                'patientID': exam['patientID'],
                'examID': exam['examID'],
                'path': exam['path'].encode(),
                'category': exam['category'].encode(),
                'shape': list(slices.shape),
                'slice_types': [t.encode() for t in slice_types],
            })
            tfr.write_record(f, example)
            written += 1
    logging.info('Wrote %d exams to %s', written, output)
    return written


_EXAM_DECODER_READY = None


def _exam_decoder():
    '''The C++ exam decoder entry point (native/exam_decoder.cc), or None.'''
    global _EXAM_DECODER_READY
    if _EXAM_DECODER_READY is None:
        import ctypes
        lib = tfr._native_lib()
        if lib and hasattr(lib, 'exam_decode'):
            lib.exam_decode.restype = ctypes.c_int64
            lib.exam_decode.argtypes = [
                ctypes.c_char_p, ctypes.c_int64,                 # rec, len
                ctypes.POINTER(ctypes.c_int64), ctypes.c_int64,  # chan_idx
                ctypes.c_int64, ctypes.c_int64,                  # crop h, w
                ctypes.c_void_p, ctypes.c_int64,                 # out, cap
                ctypes.POINTER(ctypes.c_int64),                  # shape[4]
                ctypes.POINTER(ctypes.c_int64),                  # ids[2]
                ctypes.c_char_p, ctypes.c_int64,                 # path
                ctypes.c_char_p, ctypes.c_int64,                 # category
                ctypes.c_char_p, ctypes.c_int64,                 # slice_types
            ]
            _EXAM_DECODER_READY = lib
        else:
            _EXAM_DECODER_READY = False
    return _EXAM_DECODER_READY or None


def _parse_example_exam_native(buf, output_slice_types=None):
    '''One-pass C++ decode + channel gather; None when unavailable or the
    record doesn't fit the fast path (then the Python codec handles it).'''
    import ctypes
    lib = _exam_decoder()
    if lib is None:
        return None
    shape = (ctypes.c_int64 * 4)()
    ids = (ctypes.c_int64 * 2)()
    path = ctypes.create_string_buffer(1024)
    cat = ctypes.create_string_buffer(64)
    types = ctypes.create_string_buffer(512)
    rc = lib.exam_decode(buf, len(buf), None, 0, -1, -1, None, 0,
                         shape, ids, path, 1024, cat, 64, types, 512)
    if rc != 0:
        return None
    slice_types = types.value.decode().split(',')
    if output_slice_types is not None and \
            list(output_slice_types) != slice_types:
        try:
            idx = [slice_types.index(t) for t in output_slice_types]
        except ValueError:
            return None
        slice_types = list(output_slice_types)
        cidx = (ctypes.c_int64 * len(idx))(*idx)
        n_chan = len(idx)
    else:
        cidx, n_chan = None, int(shape[3])
    # hugepage-backed output: page-fault service dominates fresh-buffer
    # writes on virtualized hosts (utils/hostmem.py)
    out = hostmem.hugepage_empty(
        (shape[0], shape[1], shape[2], n_chan), np.uint8)
    rc = lib.exam_decode(
        buf, len(buf), cidx, n_chan if cidx is not None else 0, -1, -1,
        out.ctypes.data_as(ctypes.c_void_p), out.size,
        shape, ids, path, 1024, cat, 64, types, 512)
    if rc != 0:
        return None
    return dict(
        slices=out,
        patientID=int(ids[0]),
        examID=int(ids[1]),
        path=path.value.decode(),
        category=cat.value.decode(),
        slice_types=slice_types,
    )


def parse_example_exam(buf, output_slice_types=None):
    '''Decode a serialized Example into an exam dict, optionally gathering a
    channel subset in ``output_slice_types`` order (reference data.py:473-487).

    Uses the native one-pass decoder (native/exam_decoder.cc) when the
    library is available; the pure-Python codec below is the behavioral
    reference and fallback.
    '''
    native = _parse_example_exam_native(buf, output_slice_types)
    if native is not None:
        return native
    d = tfr.decode_example(buf)
    shape = d['shape']
    slices = tfr.parse_tensor(d['slices'][0]).reshape(shape)
    slice_types = [s.decode() for s in d['slice_types']]
    if output_slice_types is not None and \
            list(output_slice_types) != slice_types:
        indices = [slice_types.index(t) for t in output_slice_types]
        # advanced indexing on the last axis yields a channel-major layout;
        # force C-contiguity or every later device_put pays a strided copy
        slices = np.ascontiguousarray(slices[..., indices])
        slice_types = list(output_slice_types)
    return dict(
        slices=slices,
        patientID=d['patientID'][0],
        examID=d['examID'][0],
        path=d['path'][0].decode(),
        category=d['category'][0].decode(),
        slice_types=slice_types,
    )


class TFRecordExamReader:
    '''Lazy random-access reader over one .tfrecords file of exams.

    Decoded exams are kept in a byte-budgeted LRU cache (default 2 GiB per
    reader) so steady-state training doesn't re-decode protos every epoch —
    the host here is the input-bound resource, the same reason the reference
    leans on tf.data's C++ runtime (reference data.py:448-512).
    '''

    def __init__(self, path, output_slice_types=None,
                 cache_bytes=2 << 30):
        from collections import OrderedDict
        self.path = path
        self.output_slice_types = (
            tuple(output_slice_types) if output_slice_types else None)
        self.index = tfr.index_records(path)
        self.cache_bytes = cache_bytes
        self._cache = OrderedDict()
        self._cached_bytes = 0

    def __len__(self):
        return len(self.index)

    def _decode(self, i):
        '''Pure decode of record ``i`` (no cache access — thread-safe).'''
        offset, length = self.index[i]
        buf = tfr.read_record_at(self.path, offset, length)
        return parse_example_exam(buf, self.output_slice_types)

    def _cache_put(self, i, exam):
        size = exam['slices'].nbytes
        while self._cache and self._cached_bytes + size > self.cache_bytes:
            _, old = self._cache.popitem(last=False)
            self._cached_bytes -= old['slices'].nbytes
        if size <= self.cache_bytes:
            self._cache[i] = exam
            self._cached_bytes += size

    def exam(self, i):
        if i in self._cache:
            self._cache.move_to_end(i)
            return self._cache[i]
        exam = self._decode(i)
        self._cache_put(i, exam)
        return exam

    def iter_exams(self, pool=None):
        '''Iterate exams in record order.

        ``pool``: decode up to that many uncached records concurrently in a
        thread pool — ctypes releases the GIL for the native decoder
        (native/exam_decoder.cc), so decode threads scale with host cores
        (the reference leans on tf.data's num_parallel_calls for the same,
        data.py:448-512). Only the consuming thread touches the LRU cache;
        workers run the pure ``_decode``. The in-flight window is bounded
        at 2x the pool so a slow consumer can't pile up decoded exams.
        '''
        n = len(self.index)
        if not pool or pool <= 1 or n <= 1:
            for i in range(n):
                yield self.exam(i)
            return
        import collections
        from concurrent.futures import ThreadPoolExecutor
        with ThreadPoolExecutor(max_workers=pool) as ex:
            pending = collections.deque()
            nxt = 0

            def fill():
                nonlocal nxt
                while nxt < n and len(pending) < 2 * pool:
                    i = nxt
                    nxt += 1
                    if i in self._cache:
                        self._cache.move_to_end(i)
                        pending.append((i, None, self._cache[i]))
                    else:
                        pending.append((i, ex.submit(self._decode, i), None))

            fill()
            while pending:
                i, fut, exam = pending.popleft()
                if fut is not None:
                    exam = fut.result()
                    self._cache_put(i, exam)
                fill()
                yield exam
