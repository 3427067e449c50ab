'''Dependency-free TensorBoard event writer.

The reference emits TensorBoard scalars, image grids, and raw PR-curve
summaries (reference: annotator/engine.py:108-111, utils/callbacks.py:184-204,
:369-403). This module writes the same artifacts as a **pure-Python** tfevents
writer — Event protos in TFRecord framing — reusing the proto/CRC machinery
from the TFRecord codec, so the framework has zero TensorFlow dependency
while staying readable by standard TensorBoard.

Supported summary kinds:
- scalars (classic ``simple_value``),
- images (classic ``Summary.Image`` with PNG payloads),
- PR curves (``pr_curves`` plugin raw-data tensors, parity with
  ``summary_lib.v1.pr_curve_raw_data_pb`` used at callbacks.py:197-203).
'''

import os
import socket
import struct
import threading
import time

import numpy as np

from ..data import tfrecord as tfr


def _varint_field(out, field, value):
    tfr._write_tag(out, field, 0)
    tfr._write_varint(out, value)


def _double_field(out, field, value):
    tfr._write_tag(out, field, 1)
    out.extend(struct.pack('<d', value))


def _float_field(out, field, value):
    tfr._write_tag(out, field, 5)
    out.extend(struct.pack('<f', value))


def _bytes_field(out, field, data):
    tfr._write_bytes_field(out, field, data)


def _encode_plugin_metadata(plugin_name, content=b''):
    plugin = bytearray()
    _bytes_field(plugin, 1, plugin_name.encode())
    if content:
        _bytes_field(plugin, 2, content)
    metadata = bytearray()
    _bytes_field(metadata, 1, plugin)
    return bytes(metadata)


def _encode_value_scalar(tag, value):
    out = bytearray()
    _bytes_field(out, 1, tag.encode())
    _float_field(out, 2, float(value))
    return bytes(out)


def _encode_value_image(tag, png_bytes, height, width, colorspace):
    image = bytearray()
    _varint_field(image, 1, height)
    _varint_field(image, 2, width)
    _varint_field(image, 3, colorspace)
    _bytes_field(image, 4, png_bytes)
    out = bytearray()
    _bytes_field(out, 1, tag.encode())
    _bytes_field(out, 4, image)
    return bytes(out)


def _encode_value_pr_curve(tag, data, num_thresholds):
    '''data: float32 [6, T] rows = TP, FP, TN, FN, precision, recall.'''
    content = bytearray()
    _varint_field(content, 1, 0)  # PrCurvePluginData.version
    _varint_field(content, 2, num_thresholds)
    out = bytearray()
    _bytes_field(out, 1, tag.encode())
    _bytes_field(out, 8, tfr.serialize_tensor(
        np.asarray(data, np.float32)))  # Value.tensor
    _bytes_field(out, 9, _encode_plugin_metadata('pr_curves', bytes(content)))
    return bytes(out)


def _encode_event(step=None, summary_values=None, file_version=None):
    out = bytearray()
    _double_field(out, 1, time.time())
    if step is not None:
        _varint_field(out, 2, int(step))
    if file_version is not None:
        _bytes_field(out, 3, file_version.encode())
    if summary_values:
        summary = bytearray()
        for v in summary_values:
            _bytes_field(summary, 1, v)
        _bytes_field(out, 5, summary)
    return bytes(out)


def encode_png(array, bitdepth=8):
    '''Encode [H, W] or [H, W, C] uint8/float array to PNG bytes.

    ``bitdepth=16`` writes a 16-bit grayscale PNG; the input is then taken
    as values in [0, 65535] (floats are clipped and rounded).
    '''
    from PIL import Image
    import io
    array = np.asarray(array)
    if bitdepth == 16:
        if array.ndim == 3 and array.shape[-1] == 1:
            array = array[..., 0]
        assert array.ndim == 2, array.shape
        array = np.clip(array, 0, 65535).astype(np.uint16)
        img = Image.fromarray(array, mode='I;16')
    else:
        if array.dtype != np.uint8:
            array = np.clip(array * 255.0, 0, 255).astype(np.uint8)
        if array.ndim == 3 and array.shape[-1] == 1:
            array = array[..., 0]
        img = Image.fromarray(array, mode='L' if array.ndim == 2 else 'RGB')
    buf = io.BytesIO()
    img.save(buf, format='PNG')
    return buf.getvalue()


class SummaryWriter:
    '''Event-file writer for one log directory.'''

    def __init__(self, logdir):
        os.makedirs(logdir, exist_ok=True)
        self.logdir = logdir
        filename = 'events.out.tfevents.%010d.%s' % (
            time.time(), socket.gethostname())
        self._file = open(os.path.join(logdir, filename), 'ab')
        self._lock = threading.Lock()
        self._write(_encode_event(file_version='brain.Event:2'))

    def _write(self, event_bytes):
        with self._lock:
            tfr.write_record(self._file, event_bytes)

    def scalar(self, tag, value, step):
        self._write(_encode_event(
            step=step, summary_values=[_encode_value_scalar(tag, value)]))

    def image(self, tag, array, step):
        '''array: [H, W], [H, W, 1] or [H, W, 3], uint8 or [0,1] float.'''
        array = np.asarray(array)
        h, w = array.shape[0], array.shape[1]
        colorspace = 1 if array.ndim == 2 or array.shape[-1] == 1 else 3
        png = encode_png(array)
        self._write(_encode_event(
            step=step,
            summary_values=[_encode_value_image(tag, png, h, w, colorspace)]))

    def pr_curve_raw(self, tag, true_positive_counts, false_positive_counts,
                     true_negative_counts, false_negative_counts, precision,
                     recall, num_thresholds, step):
        data = np.stack([
            np.asarray(true_positive_counts, np.float32),
            np.asarray(false_positive_counts, np.float32),
            np.asarray(true_negative_counts, np.float32),
            np.asarray(false_negative_counts, np.float32),
            np.asarray(precision, np.float32),
            np.asarray(recall, np.float32),
        ])
        self._write(_encode_event(
            step=step,
            summary_values=[_encode_value_pr_curve(
                f'{tag}/pr_curves', data, num_thresholds)]))

    def flush(self):
        with self._lock:
            self._file.flush()

    def close(self):
        if not self._file.closed:
            self.flush()
            self._file.close()

    def __del__(self):
        try:
            self.close()
        except Exception:
            pass
