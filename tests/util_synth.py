'''Synthetic dataset builders for tests: tiny exam trees with circle lesions.'''

import os

import numpy as np

SLICE_TYPES = ('TRA', 'ADC', 'DWI', 'DCEE', 'DCEL', 'label')


def _circle(size, cy, cx, r):
    yy, xx = np.mgrid[:size, :size]
    return ((yy - cy) ** 2 + (xx - cx) ** 2) < r ** 2


def make_exam_tree(root, n_patients=2, n_slices=3, size=64,
                   slice_types=SLICE_TYPES, categories=('cancer', 'healthy'),
                   seed=0, center_box=None, r_range=None):
    '''Write a synthetic PNG exam tree; returns the root.

    ``center_box``: optional (lo, hi) range for lesion centers (default:
    anywhere with a 16 px margin) — the parity harness confines lesions to
    the region that survives the reference's 512->output center crop.
    ``r_range``: optional (lo, hi) lesion radius range (default scales
    with image size: 5-10 px at the 64² test fixture size).
    '''
    from PIL import Image
    rng = np.random.default_rng(seed)
    lo, hi = center_box if center_box else (16, size - 16)
    r_lo, r_hi = r_range if r_range else (max(5, size // 16),
                                          max(10, size // 8))
    for category in categories:
        for pid in range(1, n_patients + 1):
            eid = 1
            exam_dir = os.path.join(root, category, str(pid), str(eid))
            for t in slice_types:
                if t == 'label' and category == 'healthy':
                    continue
                os.makedirs(os.path.join(exam_dir, t), exist_ok=True)
            for s in range(1, n_slices + 1):
                cy, cx = rng.integers(lo, hi, 2)
                r = rng.integers(r_lo, r_hi)
                for t in slice_types:
                    if t == 'label':
                        if category == 'healthy':
                            continue
                        img = _circle(size, cy, cx, r).astype(np.uint8) * 255
                    else:
                        img = rng.integers(0, 255, (size, size), np.uint8)
                        if category == 'cancer':
                            img[_circle(size, cy, cx, r)] = 220
                    Image.fromarray(img, mode='L').save(
                        os.path.join(root, category, str(pid), str(eid), t,
                                     f'{s:02d}.png'))
    return root


def make_tfrecords(tmpdir, size=64, n_patients=2, n_slices=3,
                   slice_types=SLICE_TYPES, seed=0):
    '''Build a PNG tree and pack it into cancer/healthy tfrecords files.

    Returns (cancer_path, healthy_path).
    '''
    from dnncancerannotator_tpu.data import generate_tfrecords
    tree = os.path.join(tmpdir, 'tree')
    make_exam_tree(tree, n_patients=n_patients, n_slices=n_slices, size=size,
                   slice_types=slice_types, seed=seed)
    cancer = os.path.join(tmpdir, 'cancer.tfrecords')
    healthy = os.path.join(tmpdir, 'healthy.tfrecords')
    generate_tfrecords(tree, cancer, category='cancer',
                       slice_types=slice_types, output_size=(size, size))
    generate_tfrecords(tree, healthy, category='healthy',
                       slice_types=slice_types, output_size=(size, size))
    return cancer, healthy
