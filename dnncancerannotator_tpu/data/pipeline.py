'''Dataset pipeline: host-side streaming/shuffling/batching of uint8 slices,
with all float math deferred to jitted device transforms.

Parity map to the reference tf.data pipeline (reference: annotator/data.py):

- ``train_ds`` (data.py:62-111): base 512-crop -> augmentation chain ->
  feature/label split -> shuffle(buffer) -> repeat -> batch -> prefetch.
  Here the host stream yields raw uint8 slices (shuffled/batched) and the
  augmentation + normalize + split compile into the engine's train step.
- ``eval_ds`` (data.py:114-144): deterministic center-crop, optional metadata
  lane, fixed batching.
- ``normalize_exams`` (data.py:515-525): equal sampling across .tfrecords
  files via per-file infinite round-robin (for the directory branch, per-exam
  round-robin, matching data.py:168-179).
- Metadata elements carry {patientID, examID, path, category, slice_types,
  sliceID} with sliceID = index within the exam (data.py:488-509). Strings
  stay on the host — device batches carry only the image tensor.
'''

import logging
import os
from typing import Iterator

import numpy as np

logger = logging.getLogger(__name__)

from . import augment as augment_mod
from . import records
from .records import DEFAULT_SLICE_TYPES, TFRecordExamReader
from ..utils import hostmem


def _is_tfrecords(path):
    return os.path.splitext(path)[1] == '.tfrecords'


def _center_crop_or_pad(img, th, tw):
    '''Center crop [H, W, C] to (th, tw); pads with zeros if smaller.'''
    h, w = img.shape[0], img.shape[1]
    if h < th or w < tw:
        pad_h, pad_w = max(th - h, 0), max(tw - w, 0)
        img = np.pad(img, ((pad_h // 2, pad_h - pad_h // 2),
                           (pad_w // 2, pad_w - pad_w // 2), (0, 0)))
        h, w = img.shape[0], img.shape[1]
    top, left = (h - th) // 2, (w - tw) // 2
    return img[top:top + th, left:left + tw, :]


def _exam_elements(exam, crop=None):
    '''Yield (slice_uint8, meta) per slice of one exam dict.'''
    slices = exam['slices']
    for slice_id in range(slices.shape[0]):
        img = slices[slice_id]
        if crop is not None:
            img = _center_crop_or_pad(img, *crop)
        meta = dict(
            patientID=exam['patientID'], examID=exam['examID'],
            path=exam['path'], category=exam['category'],
            slice_types=list(exam['slice_types']), sliceID=slice_id)
        yield img, meta


class _DirExamSource:
    '''One exam directory as an exam source (directory-tree branch).'''

    def __init__(self, exam_dir, slice_types):
        self.exam_dir = exam_dir
        self.slice_types = tuple(slice_types)
        self._exam = None

    def iter_exams(self, pool=None):
        del pool  # single exam; nothing to parallelize
        yield self.exam(0)

    def __len__(self):
        return 1

    def exam(self, i):
        assert i == 0, i
        if self._exam is None:
            exam = records.prepare_combined_slices(
                self.exam_dir, slice_types=self.slice_types)
            exam['slice_types'] = list(self.slice_types)
            self._exam = exam
        return self._exam


def _sources(paths, slice_types):
    '''Resolve data paths into per-source exam readers.

    .tfrecords files -> one source per file; directories -> one source per
    exam dir (glob path/*/*/*, reference data.py:168-179, :256-257).
    '''
    if isinstance(paths, str):
        paths = [paths]
    paths = list(paths)
    if _is_tfrecords(paths[0]):
        assert all(map(_is_tfrecords, paths)), \
            'cannot mix .tfrecords files and directories'
        return [TFRecordExamReader(p, slice_types) for p in paths]
    from glob import glob
    exam_dirs = []
    for p in paths:
        assert os.path.isdir(p), f'not a directory: {p}'
        exam_dirs.extend(sorted(glob(os.path.join(p, *'*' * 3))))
    return [_DirExamSource(d, slice_types) for d in exam_dirs]


def _resolve_pool(decode_pool):
    ''''auto' -> one decode thread per host core (capped at 8); 0/1/None
    -> serial. The native exam decoder releases the GIL, so threads give
    real parallelism (reference analog: tf.data num_parallel_calls).'''
    if decode_pool == 'auto':
        return min(8, os.cpu_count() or 1)
    return int(decode_pool or 0)


def _source_stream(source, crop, repeat, pool=None):
    '''Slice elements of one source, optionally cycling forever.'''
    while True:
        count = 0
        for exam in source.iter_exams(pool=pool):
            for element in _exam_elements(exam, crop):
                count += 1
                yield element
        if not repeat or count == 0:
            return


def _interleave(streams):
    '''Round-robin across streams (equal sampling; reference interleave
    with per-source repeat, data.py:517-525).'''
    alive = list(streams)
    while alive:
        nxt = []
        for stream in alive:
            try:
                yield next(stream)
                nxt.append(stream)
            except StopIteration:
                pass
        alive = nxt


def _shuffle(stream, buffer_size, rng):
    '''tf.data-style buffered shuffle: fill a buffer, emit a random element,
    backfill from the stream.'''
    buf = []
    for item in stream:
        if len(buf) < buffer_size:
            buf.append(item)
            continue
        i = int(rng.integers(len(buf)))
        out, buf[i] = buf[i], item
        yield out
    rng.shuffle(buf)
    yield from buf


class TrainDataset:
    '''Training dataset handle.

    Yields raw uint8 [B, base, base, C] host batches; the augmentation chain
    (``augment_methods``) plus normalize/split run on device inside the
    engine's jitted train step.
    '''

    def __init__(self, path, batch_size, buffer_size, repeat=True,
                 slice_types=DEFAULT_SLICE_TYPES, normalize_exams=True,
                 output_size=(256, 256), augment_options=None, base_size=512,
                 seed=0, device_cache=True, loader='native',
                 grain_workers=0, decode_pool='auto'):
        assert loader in ('native', 'grain'), loader
        self.slice_types = tuple(slice_types)
        self.batch_size = batch_size
        self.buffer_size = buffer_size
        self.repeat = repeat
        self.normalize_exams = normalize_exams
        self.output_size = tuple(output_size)
        self.base_size = (base_size, base_size)
        self.seed = seed
        self.device_cache = device_cache
        self.loader = loader
        self.grain_workers = grain_workers
        self.decode_pool = _resolve_pool(decode_pool)
        self.paths = path
        self.augment_methods = augment_mod.parse_augment_options(
            augment_options, self.slice_types, self.output_size)
        self.n_channels = len(self.slice_types)
        # When the first augmentation is a jittered center crop, only a
        # centered (out + 2*max_jitter) window of the source can ever be read
        # — pre-crop on the host so the device transfer shrinks accordingly
        # (identical semantics: the crop offset is relative to the center).
        self.host_crop = self.base_size
        if self.augment_methods and self.augment_methods[0][0] == 'random_crop':
            opts = self.augment_methods[0][1]
            margin = 2 * int(opts.get('max_', 6))
            th, tw = opts.get('output_size', self.output_size)
            self.host_crop = (min(th + margin, self.base_size[0]),
                              min(tw + margin, self.base_size[1]))

    @property
    def element_shape(self):
        '''Raw batch shape fed to the device.'''
        return (self.batch_size, *self.host_crop, self.n_channels)

    @property
    def feature_shape(self):
        '''Post-augmentation feature shape [B, h, w, C-1].'''
        out = self.output_size if any(
            n == 'random_crop' for n, _ in self.augment_methods) \
            else self.base_size
        return (self.batch_size, *out, self.n_channels - 1)

    def load_resident(self, budget_bytes=8 << 30):
        '''Materialize the whole training set as host arrays for the
        device-resident input path.

        TPU-native steady state: the uint8 slice tensor lives in HBM and each
        train step *gathers* its batch with on-device random indices — zero
        host work per step (the host streaming path remains for datasets
        over ``budget_bytes``).

        Returns None if the dataset exceeds the budget, else a dict with
        ``data`` [N, h, w, C] uint8, and per-source ``starts``/``counts``
        (equal-probability sampling across sources reproduces
        ``normalize_exams`` semantics, reference data.py:515-525).
        '''
        if not self.device_cache or self.loader == 'grain':
            return None
        sources = _sources(self.paths, self.slice_types)
        chunks = []
        starts, counts = [], []
        total = 0
        n = 0
        for source in sources:
            starts.append(n)
            count = 0
            for exam in source.iter_exams(pool=self.decode_pool):
                for img, _meta in _exam_elements(exam, self.host_crop):
                    total += img.nbytes
                    if total > budget_bytes:
                        return None
                    chunks.append(img)
                    count += 1
                    n += 1
            counts.append(count)
        if not chunks:
            return None
        # Drop zero-slice sources (e.g. an empty .tfrecords file): the
        # balanced on-device sampler draws idx = starts[f] + u*counts[f],
        # which for counts[f] == 0 clamps to starts[f]-1 — a slice of the
        # PREVIOUS source. The streaming and grain paths already skip them.
        keep = [i for i, c in enumerate(counts) if c > 0]
        starts = [starts[i] for i in keep]
        counts = [counts[i] for i in keep]
        # hugepage-backed pool: first-touch faults of a multi-GB stack run
        # ~20x faster as THP on this host class (utils/hostmem.py)
        data = hostmem.hugepage_empty(
            (len(chunks), *chunks[0].shape), chunks[0].dtype)
        np.stack(chunks, out=data)
        return dict(data=data,
                    starts=np.asarray(starts, np.int32),
                    counts=np.asarray(counts, np.int32),
                    balanced=self.normalize_exams)

    def _elements(self):
        '''Element stream honoring both cycling knobs.

        ``normalize_exams`` cycles each source independently (equal sampling,
        reference data.py:515-525); ``repeat`` cycles the WHOLE dataset across
        epochs — the reference applies ``.repeat()`` unconditionally in
        train_ds (data.py:106-110), so with ``normalize_exams: false`` the
        stream must still restart after each in-order pass rather than die.
        '''
        while True:
            sources = _sources(self.paths, self.slice_types)
            streams = [
                _source_stream(s, self.host_crop, repeat=self.normalize_exams,
                               pool=self.decode_pool)
                for s in sources]
            yield from _interleave(streams)
            if not self.repeat:
                return

    def _grain_batches(self, seed) -> Iterator[np.ndarray]:
        '''grain-backed host loader (``data_options.train.loader: grain``).

        Random-access slice-level source over the TFRecord readers, grain's
        global shuffle + multiprocess workers, batched to the same raw uint8
        [B, hc, wc, C] elements as the native loader. ``normalize_exams`` is
        approximated per epoch by repeating smaller sources' indices up to
        the largest source (exact equal-probability sampling with
        replacement stays on the native/resident paths).
        '''
        import grain.python as gp

        sources = _sources(self.paths, self.slice_types)
        host_crop = self.host_crop
        per_source = []
        for si, source in enumerate(sources):
            items = []
            for ei in range(len(source)):
                n = source.exam(ei)['slices'].shape[0]
                items.extend((si, ei, sj) for sj in range(n))
            # an empty source (e.g. a 0-record .tfrecords file) contributes
            # nothing, same as the native path's _source_stream
            if items:
                per_source.append(items)
        index = []
        if self.normalize_exams and len(per_source) > 1:
            logger.warning(
                'loader: grain approximates normalize_exams by equalizing '
                'per-source index counts per epoch (each draw is '
                'equal-probability across sources, but without replacement '
                'within an epoch); the native loader samples sources with '
                'replacement — reference data.py:515-525 semantics.')
            target = max(len(it) for it in per_source)
            for items in per_source:
                reps = -(-target // len(items))
                index.extend((items * reps)[:target])
        else:
            for items in per_source:
                index.extend(items)

        class _Source:
            def __len__(self):
                return len(index)

            def __getitem__(self, i):
                si, ei, sj = index[i]
                img = sources[si].exam(ei)['slices'][sj]
                return _center_crop_or_pad(img, *host_crop)

        sampler = gp.IndexSampler(
            num_records=len(index),
            shuffle=True,
            seed=int(seed),
            shard_options=gp.NoSharding(),
            num_epochs=None if self.repeat else 1,
        )
        loader = gp.DataLoader(
            data_source=_Source(),
            sampler=sampler,
            operations=[gp.Batch(self.batch_size, drop_remainder=True)],
            worker_count=self.grain_workers,
        )
        for batch in loader:
            yield np.ascontiguousarray(batch)

    def raw_batches(self, seed=None) -> Iterator[np.ndarray]:
        '''Infinite (if repeat) stream of raw uint8 batches.'''
        if self.loader == 'grain':
            yield from self._grain_batches(
                self.seed if seed is None else seed)
            return
        rng = np.random.default_rng(self.seed if seed is None else seed)
        stream = (img for img, _meta in self._elements())
        stream = _shuffle(stream, self.buffer_size, rng)
        batch = []
        for img in stream:
            batch.append(img)
            if len(batch) == self.batch_size:
                yield np.ascontiguousarray(np.stack(batch))
                batch = []


class EvalDataset:
    '''Evaluation dataset handle: deterministic, finite, optional metadata.'''

    def __init__(self, path, batch_size, slice_types=DEFAULT_SLICE_TYPES,
                 include_meta=False, output_size=(512, 512),
                 decode_pool='auto'):
        self.slice_types = tuple(slice_types)
        self.batch_size = batch_size
        self.include_meta = include_meta
        self.output_size = tuple(output_size) if output_size else None
        self.paths = path
        self.n_channels = len(self.slice_types)
        self.decode_pool = _resolve_pool(decode_pool)
        self._n_batches = None

    @property
    def element_shape(self):
        return (self.batch_size, *self.output_size, self.n_channels)

    @property
    def feature_shape(self):
        '''Shape of the model input (label channel excluded).'''
        return (self.batch_size, *self.output_size, self.n_channels - 1)

    def batches(self):
        '''Yield dicts {'slices': uint8 [b, h, w, C], 'meta': [b dicts]}.
        The final batch may be smaller.'''
        sources = _sources(self.paths, self.slice_types)
        imgs, metas = [], []
        for source in sources:
            for exam in source.iter_exams(pool=self.decode_pool):
                for img, meta in _exam_elements(exam, self.output_size):
                    imgs.append(img)
                    metas.append(meta)
                    if len(imgs) == self.batch_size:
                        yield dict(slices=np.stack(imgs), meta=metas)
                        imgs, metas = [], []
        if imgs:
            yield dict(slices=np.stack(imgs), meta=metas)

    def __len__(self):
        if self._n_batches is None:
            self._n_batches = sum(1 for _ in self.batches())
        return self._n_batches


def base(path, slice_types=DEFAULT_SLICE_TYPES, output_size=(512, 512),
         normalize_exams=True, include_meta=False):
    '''Base element stream (API parity with reference data.py:157-207):
    yields center-cropped float32 slices in [0, 1], or
    ``{'slice': ..., meta...}`` dicts when ``include_meta``.

    When ``normalize_exams`` the stream is an infinite equal-sampling
    round-robin across sources; otherwise one pass in order.
    '''
    sources = _sources(path, slice_types)
    streams = [
        _source_stream(s, tuple(output_size) if output_size else None,
                       repeat=normalize_exams)
        for s in sources]
    for img, meta in _interleave(streams):
        slice_f32 = img.astype(np.float32) / 255.0
        if include_meta:
            yield dict(slice=slice_f32, **meta)
        else:
            yield slice_f32


def train_ds(path, batch_size, buffer_size, repeat=True,
             slice_types=DEFAULT_SLICE_TYPES, normalize_exams=True,
             output_size=(256, 256), augment_options=None, **kwargs):
    '''Build the training dataset (reference data.py:62-111 signature).'''
    return TrainDataset(
        path, batch_size=batch_size, buffer_size=buffer_size, repeat=repeat,
        slice_types=slice_types, normalize_exams=normalize_exams,
        output_size=output_size, augment_options=augment_options, **kwargs)


def eval_ds(path, batch_size, slice_types=DEFAULT_SLICE_TYPES,
            include_meta=False, output_size=(512, 512), decode_pool='auto',
            **kwargs):
    '''Build the evaluation dataset (reference data.py:114-144 signature).'''
    return EvalDataset(
        path, batch_size=batch_size, slice_types=slice_types,
        include_meta=include_meta, output_size=output_size,
        decode_pool=decode_pool)


def predict_ds(path, slice_types=DEFAULT_SLICE_TYPES, output_size=(512, 512),
               batch_size=1):
    '''Prediction dataset: eval elements with metadata (reference
    data.py:147-154; the reference leaves the predict CLI a stub — here it
    is wired up).'''
    return EvalDataset(path, batch_size=batch_size, slice_types=slice_types,
                       include_meta=True, output_size=output_size)
