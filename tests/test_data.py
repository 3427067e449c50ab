'''Data layer tests: TFRecord codec, exam ingestion, pipeline semantics,
device-side augmentations.'''

import os

import numpy as np
import pytest

from dnncancerannotator_tpu.data import (
    augment, eval_ds, generate_tfrecords, records, tfrecord as tfr, train_ds)
from tests import util_synth


def test_crc32c_vector():
    assert tfr.crc32c(b'123456789') == 0xE3069283
    assert tfr.crc32c(b'') == 0


def test_example_roundtrip(tmp_path):
    arr = np.arange(2 * 4 * 4 * 3, dtype=np.uint8).reshape(2, 4, 4, 3)
    ex = tfr.encode_example({
        'slices': tfr.serialize_tensor(arr),
        'patientID': 42, 'examID': 7, 'path': b'/x', 'category': b'cancer',
        'shape': list(arr.shape), 'slice_types': [b'TRA', b'ADC', b'label'],
    })
    p = tmp_path / 'x.tfrecords'
    with open(p, 'wb') as f:
        tfr.write_record(f, ex)
    recs = list(tfr.read_records(p, verify_crc=True))
    assert len(recs) == 1
    d = tfr.decode_example(recs[0])
    assert d['patientID'] == [42]
    assert d['category'] == [b'cancer']
    assert d['slice_types'] == [b'TRA', b'ADC', b'label']
    out = tfr.parse_tensor(d['slices'][0])
    np.testing.assert_array_equal(out, arr)


def test_index_records(tmp_path):
    p = tmp_path / 'x.tfrecords'
    payloads = [bytes([i]) * (10 + i) for i in range(5)]
    with open(p, 'wb') as f:
        for payload in payloads:
            tfr.write_record(f, payload)
    idx = tfr.index_records(p)
    assert len(idx) == 5
    for (off, length), payload in zip(idx, payloads):
        assert tfr.read_record_at(p, off, length) == payload


@pytest.fixture(scope='module')
def dataset(tmp_path_factory):
    tmpdir = tmp_path_factory.mktemp('synth')
    cancer, healthy = util_synth.make_tfrecords(str(tmpdir), size=64)
    return str(tmpdir), cancer, healthy


def test_generate_and_read_tfrecords(dataset):
    _, cancer, healthy = dataset
    reader = records.TFRecordExamReader(cancer)
    assert len(reader) == 2  # 2 cancer patients
    exam = reader.exam(0)
    assert exam['slices'].shape == (3, 64, 64, 6)
    assert exam['category'] == 'cancer'
    assert exam['slice_types'] == list(util_synth.SLICE_TYPES)
    # label channel binary-ish
    assert set(np.unique(exam['slices'][..., -1])) <= {0, 255}

    healthy_reader = records.TFRecordExamReader(healthy)
    hexam = healthy_reader.exam(0)
    assert hexam['category'] == 'healthy'
    assert np.all(hexam['slices'][..., -1] == 0)  # synthesized zero label


def test_channel_subset(dataset):
    _, cancer, _ = dataset
    reader = records.TFRecordExamReader(
        cancer, output_slice_types=('TRA', 'label'))
    exam = reader.exam(0)
    assert exam['slices'].shape[-1] == 2
    assert exam['slice_types'] == ['TRA', 'label']
    full = records.TFRecordExamReader(cancer).exam(0)
    np.testing.assert_array_equal(exam['slices'][..., 0], full['slices'][..., 0])
    np.testing.assert_array_equal(exam['slices'][..., 1], full['slices'][..., -1])


def test_train_stream_balanced(dataset):
    _, cancer, healthy = dataset
    ds = train_ds([cancer, healthy], batch_size=4, buffer_size=8,
                  output_size=(32, 32), base_size=64)
    it = ds.raw_batches(seed=0)
    batch = next(it)
    # host pre-crop: random_crop(32) with +-6 jitter only reads a centered
    # 44x44 window, so that's all that ships to the device
    assert batch.shape == ds.element_shape == (4, 44, 44, 6)
    assert batch.dtype == np.uint8
    assert batch.flags['C_CONTIGUOUS']
    # infinite when normalize_exams
    for _ in range(5):
        next(it)


def test_repeat_without_normalize(dataset):
    '''``repeat`` cycles the whole dataset even with normalize_exams=False —
    the reference applies .repeat() unconditionally (data.py:106-110), so an
    in-order pass must restart rather than end the stream after one epoch.'''
    _, cancer, healthy = dataset
    ds = train_ds([cancer, healthy], batch_size=4, buffer_size=4,
                  normalize_exams=False, repeat=True, device_cache=False,
                  output_size=(32, 32), base_size=64)
    it = ds.raw_batches(seed=0)
    for _ in range(10):  # 40 elements >> 12 per epoch: crosses 3+ epochs
        assert next(it).shape == ds.element_shape


def test_no_repeat_exhausts_after_one_epoch(dataset):
    _, cancer, healthy = dataset
    ds = train_ds([cancer, healthy], batch_size=4, buffer_size=4,
                  normalize_exams=False, repeat=False, device_cache=False,
                  output_size=(32, 32), base_size=64)
    batches = list(ds.raw_batches(seed=0))
    assert len(batches) == 3  # 12 slices / batch 4, single pass


def test_eval_ds_meta(dataset):
    _, cancer, healthy = dataset
    ds = eval_ds([cancer, healthy], batch_size=5, include_meta=True,
                 output_size=(64, 64))
    batches = list(ds.batches())
    total = sum(b['slices'].shape[0] for b in batches)
    assert total == 12  # 4 exams x 3 slices
    meta = batches[0]['meta'][0]
    assert set(meta) >= {'patientID', 'examID', 'path', 'category', 'sliceID'}
    assert meta['sliceID'] == 0


def test_dir_tree_branch(dataset):
    tmpdir, _, _ = dataset
    tree = os.path.join(tmpdir, 'tree')
    ds = eval_ds([tree], batch_size=4, output_size=(48, 48))
    batches = list(ds.batches())
    assert sum(b['slices'].shape[0] for b in batches) == 12
    assert batches[0]['slices'].shape[1:] == (48, 48, 6)


def test_augment_chain_shapes():
    import jax
    methods = augment.parse_augment_options(
        {'random_crop': None, 'random_flip': None, 'random_contrast': None,
         'random_warp': {'n_points': 10}},
        util_synth.SLICE_TYPES, output_size=(32, 32))
    fn = jax.jit(augment.build_augment_fn(methods))
    x = jax.random.uniform(jax.random.PRNGKey(0), (2, 48, 48, 6))
    out = fn(x, jax.random.PRNGKey(1))
    assert out.shape == (2, 32, 32, 6)
    feats, label = augment.to_feature_label(out, util_synth.SLICE_TYPES)
    assert feats.shape == (2, 32, 32, 5)
    assert label.shape == (2, 32, 32)


def test_random_hue_rejected_at_parse():
    '''random_hue is a deliberate exclusion (PARITY.md): the reference's
    tf.image.random_hue needs RGB, but its data is 5-channel grayscale —
    the key is accepted but rejected at parse time with a clear error
    (reference data.py:612-618 would itself crash inside rgb_to_hsv).'''
    with pytest.raises(NotImplementedError, match='RGB'):
        augment.parse_augment_options(
            {'random_crop': None, 'random_hue': {'max_delta': 0.2}},
            util_synth.SLICE_TYPES, output_size=(32, 32))


def test_contrast_target_channels_none_adjusts_all():
    '''target_channels: None means adjust ALL channels (adjust_contrast
    semantics) and must stay on the composed path (the fused kernel
    builds an index mask); parse must not crash on the None.'''
    import jax
    methods = augment.parse_augment_options(
        {'random_crop': None, 'random_flip': None,
         'random_contrast': {'target_channels': None},
         'random_warp': {'n_points': 10}},
        util_synth.SLICE_TYPES, output_size=(32, 32))
    assert methods[2][1]['target_channels'] is None
    assert not augment._fused_chain_eligible(methods)
    fn = jax.jit(augment.build_augment_fn(methods))
    x = jax.random.uniform(jax.random.PRNGKey(0), (2, 48, 48, 6))
    assert fn(x, jax.random.PRNGKey(1)).shape == (2, 32, 32, 6)


def test_crop_select_and_gather_paths_agree():
    '''Both crop strategies must produce identical pixels for the same key,
    and a wide jitter window (random_crop not first, full-size input) must
    take the gather path instead of statically unrolling H*W branches.'''
    import jax
    import jax.numpy as jnp

    x = jax.random.uniform(jax.random.PRNGKey(0), (4, 64, 64, 3))
    key = jax.random.PRNGKey(7)
    # same offsets both ways
    off = jnp.clip((jax.random.normal(key, [4, 2]) * 4).astype(jnp.int32),
                   -6, 6) + jnp.array([(64 - 32) // 2] * 2, jnp.int32)
    off = jnp.clip(off, 0, 64 - 32)
    sel = augment._crop_select(x, off, (32, 32),
                               (16 - 6, 16 + 6), (16 - 6, 16 + 6))
    gat = augment._crop_gather(x, off, (32, 32))
    np.testing.assert_array_equal(np.asarray(sel), np.asarray(gat))

    # huge jitter window -> falls back to gather, still correct shape + crop
    wide = jax.jit(lambda im, k: augment.random_crop_batch(
        im, k, output_size=(32, 32), stddev=20, max_=50, min_=-50))
    out = wide(x, key)
    assert out.shape == (4, 32, 32, 3)
    # every output is some 32x32 window of its source image
    for i in range(4):
        found = any(
            np.array_equal(np.asarray(out)[i],
                           np.asarray(x)[i, dy:dy + 32, dx:dx + 32])
            for dy in range(33) for dx in range(33))
        assert found, f'crop {i} is not a window of its source'


def test_crop_second_in_chain_compiles():
    '''random_crop placed AFTER another augmentation sees the full-size
    image (no host pre-crop); the unroll bound must keep this compilable.'''
    import jax
    methods = augment.parse_augment_options(
        {'random_flip': None, 'random_crop': None},
        ('TRA', 'label'), output_size=(32, 32))
    fn = jax.jit(augment.build_augment_fn(methods))
    x = jax.random.uniform(jax.random.PRNGKey(0), (2, 128, 128, 2))
    assert fn(x, jax.random.PRNGKey(1)).shape == (2, 32, 32, 2)


def test_contrast_preserves_label():
    import jax
    import jax.numpy as jnp
    methods = augment.parse_augment_options(
        {'random_contrast': None}, ('TRA', 'label'), output_size=(16, 16))
    fn = augment.build_augment_fn(methods)
    x = jax.random.uniform(jax.random.PRNGKey(0), (2, 16, 16, 2))
    out = fn(x, jax.random.PRNGKey(1))
    np.testing.assert_allclose(out[..., 1], x[..., 1])  # label untouched
    assert not np.allclose(out[..., 0], x[..., 0])


def test_warp_identity_when_no_diff():
    import jax.numpy as jnp
    from dnncancerannotator_tpu.ops.warp import sparse_image_warp
    img = np.random.default_rng(0).random((1, 24, 24, 2)).astype(np.float32)
    pts = np.random.default_rng(1).uniform(0, 24, (1, 8, 2)).astype(np.float32)
    out = sparse_image_warp(jnp.asarray(img), jnp.asarray(pts), jnp.asarray(pts))
    np.testing.assert_allclose(np.asarray(out), img, atol=1e-4)


def test_warp_constant_shift():
    '''A uniform +2px control displacement must shift image content.'''
    import jax.numpy as jnp
    from dnncancerannotator_tpu.ops.warp import sparse_image_warp
    img = np.zeros((1, 32, 32, 1), np.float32)
    img[0, 10:14, 10:14, 0] = 1.0
    gy, gx = np.mgrid[4:32:8, 4:32:8]
    src = np.stack([gy.ravel(), gx.ravel()], -1)[None].astype(np.float32)
    dst = src + np.array([2.0, 0.0], np.float32)
    out = np.asarray(sparse_image_warp(
        jnp.asarray(img), jnp.asarray(src), jnp.asarray(dst)))
    # content moves +2 rows: out[y] ~ img[y-2]
    np.testing.assert_allclose(out[0, 12:16, 10:14, 0], 1.0, atol=0.15)


def test_decode_pool_matches_serial(tmpdir):
    '''Pooled exam decoding (records.TFRecordExamReader.iter_exams(pool=N))
    must yield the identical exams in the identical order as the serial
    path, including the cached-then-pooled mix.'''
    from dnncancerannotator_tpu.data.records import TFRecordExamReader
    cancer, _ = util_synth.make_tfrecords(str(tmpdir), size=64, n_patients=3)
    serial = list(TFRecordExamReader(str(cancer)).iter_exams())
    reader = TFRecordExamReader(str(cancer))
    reader.exam(1)  # pre-populate one cache entry: mixed cache/pool path
    pooled = list(reader.iter_exams(pool=4))
    assert len(serial) == len(pooled) > 1
    for a, b in zip(serial, pooled):
        np.testing.assert_array_equal(a['slices'], b['slices'])
        assert (a['patientID'], a['examID'], a['category']) == \
            (b['patientID'], b['examID'], b['category'])
    # pooled again, now fully cached
    again = list(reader.iter_exams(pool=4))
    for a, b in zip(serial, again):
        np.testing.assert_array_equal(a['slices'], b['slices'])


def test_eval_ds_honors_decode_pool(dataset):
    '''decode_pool plumbs through eval_ds/EvalDataset (it used to be
    hardcoded to 'auto', so decode_pool=0 configs still spun up threads
    for every eval pass).'''
    _, cancer, _ = dataset
    ds = eval_ds([cancer], batch_size=4, decode_pool=0)
    assert ds.decode_pool == 0
    ds_auto = eval_ds([cancer], batch_size=4)
    assert ds_auto.decode_pool >= 1
    # the serial path still yields batches
    batch = next(iter(ds.batches()))
    assert batch['slices'].shape[0] == 4
