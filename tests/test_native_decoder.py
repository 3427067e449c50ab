'''Native C++ exam decoder: bitwise parity with the pure-Python codec.'''

import numpy as np
import pytest

from dnncancerannotator_tpu.data import records, tfrecord as tfr


def _make_example(seed=0, shape=(3, 40, 48, 6),
                  types=('TRA', 'ADC', 'DWI', 'DCEE', 'DCEL', 'label')):
    rng = np.random.default_rng(seed)
    slices = rng.integers(0, 255, shape, np.uint8)
    return slices, tfr.encode_example({
        'slices': tfr.serialize_tensor(slices),
        'patientID': 17,
        'examID': 3,
        'path': b'/data/cancer/17/3',
        'category': b'cancer',
        'shape': list(shape),
        'slice_types': [t.encode() for t in types],
    })


@pytest.fixture
def native():
    lib = records._exam_decoder()
    if lib is None:
        pytest.skip('native exam decoder not built')
    return lib


def test_full_decode_parity(native):
    slices, buf = _make_example()
    got = records._parse_example_exam_native(buf)
    assert got is not None
    np.testing.assert_array_equal(got['slices'], slices)
    assert got['patientID'] == 17 and got['examID'] == 3
    assert got['path'] == '/data/cancer/17/3'
    assert got['category'] == 'cancer'
    assert got['slice_types'] == [
        'TRA', 'ADC', 'DWI', 'DCEE', 'DCEL', 'label']


def test_channel_subset_parity(native):
    slices, buf = _make_example(seed=1)
    want = ('label', 'TRA', 'DWI')
    got = records._parse_example_exam_native(buf, want)
    ref = _reference_decode(buf, want)
    np.testing.assert_array_equal(got['slices'], ref['slices'])
    assert got['slices'].flags['C_CONTIGUOUS']
    assert got['slice_types'] == list(want)
    for k in ('patientID', 'examID', 'path', 'category'):
        assert got[k] == ref[k], k


def _reference_decode(buf, output_slice_types=None):
    '''Pure-Python reference path (bypass the native fast path).'''
    d = tfr.decode_example(buf)
    shape = d['shape']
    slices = tfr.parse_tensor(d['slices'][0]).reshape(shape)
    slice_types = [s.decode() for s in d['slice_types']]
    if output_slice_types is not None and \
            list(output_slice_types) != slice_types:
        indices = [slice_types.index(t) for t in output_slice_types]
        slices = np.ascontiguousarray(slices[..., indices])
        slice_types = list(output_slice_types)
    return dict(slices=slices, patientID=d['patientID'][0],
                examID=d['examID'][0], path=d['path'][0].decode(),
                category=d['category'][0].decode(), slice_types=slice_types)


def test_public_entry_uses_native_with_same_result(native):
    _, buf = _make_example(seed=2)
    want = ('TRA', 'label')
    via_public = records.parse_example_exam(buf, want)
    ref = _reference_decode(buf, want)
    np.testing.assert_array_equal(via_public['slices'], ref['slices'])
    assert via_public['slice_types'] == list(want)


def test_unknown_slice_type_falls_back():
    '''A requested type missing from the record must not crash the native
    path; the public entry raises the same error as the reference codec.'''
    _, buf = _make_example(seed=3)
    assert records._parse_example_exam_native(buf, ('NOPE',)) is None
    with pytest.raises(ValueError):
        records.parse_example_exam(buf, ('NOPE',))


def test_reader_roundtrip_through_file(tmp_path, native):
    '''TFRecordExamReader end-to-end over a real file with the native path.'''
    path = str(tmp_path / 'x.tfrecords')
    all_slices = []
    with open(path, 'wb') as f:
        for seed in range(3):
            slices, buf = _make_example(seed=seed)
            tfr.write_record(f, buf)
            all_slices.append(slices)
    reader = records.TFRecordExamReader(path, output_slice_types=('DWI',))
    assert len(reader) == 3
    for i in range(3):
        exam = reader.exam(i)
        np.testing.assert_array_equal(
            exam['slices'][..., 0], all_slices[i][..., 2])
