'''Screenshot-extraction tests on synthetic clinical collages.'''

import os

import numpy as np
import pytest

cv2 = pytest.importorskip('cv2')

from dnncancerannotator_tpu.runs import extract as ex

PANE = 520
START = 20


def make_collage(with_label=True, seed=0):
    '''White-grid collage: 2x3 dark panes, optional red annotation ring in
    the label pane (top-left).'''
    h, w = 1080, 1600
    img = np.zeros((h, w, 3), np.uint8)
    img[:] = 40  # dark monochrome background
    # bright grid lines
    for y in (START, START + PANE, START + 2 * PANE):
        img[y, :, :] = 255
    for x in (START, START + PANE, START + 2 * PANE, min(START + 3 * PANE, w - 1)):
        img[:, x, :] = 255
    # distinguishable pane contents (monochrome)
    for r in range(2):
        for c in range(3):
            # pane fill must stay below separator_value=100 binarization
            val = 50 + 8 * (r * 3 + c)
            img[START + r * PANE + 2:START + (r + 1) * PANE,
                START + c * PANE + 2:START + (c + 1) * PANE] = val
    if with_label:
        cy, cx = START + PANE // 2, START + PANE // 2
        cv2.circle(img, (cx, cy), 80, (0, 0, 255), thickness=3)
    return img


def test_detect_internals_grid():
    boxes = ex.detect_internals(make_collage())
    assert len(boxes) == 6
    sx, sy, exx, eyy = boxes[0]
    # detected pane geometry matches the drawn grid to within a couple px
    assert abs((exx - sx) - PANE) <= 2 and abs((eyy - sy) - PANE) <= 2
    assert abs(sx - START) <= 2 and abs(sy - START) <= 2
    # tiling: row-major 2x3
    assert abs(boxes[1][1] - (START + PANE)) <= 2
    assert abs(boxes[3][0] - (START + PANE)) <= 2


def test_detect_internals_jax_conv_matches():
    boxes_scipy = ex.detect_internals(make_collage())
    boxes_jax = ex.detect_internals(make_collage(), use_jax=True)
    assert [tuple(map(int, b)) for b in boxes_scipy] == \
        [tuple(map(int, b)) for b in boxes_jax]


def test_label_exists():
    img = make_collage(with_label=True)
    pane = img[START:START + PANE, START:START + PANE]
    assert ex.label_exists(pane)
    img2 = make_collage(with_label=False)
    pane2 = img2[START:START + PANE, START:START + PANE]
    assert not ex.label_exists(pane2)


def test_extract_label_fills_annotation():
    img = make_collage(with_label=True)
    pane = img[START:START + PANE, START:START + PANE]
    label = ex.extract_label(pane, kernel_size=5, iterations=7)
    area = (label > 0).sum()
    # ring of radius 80 filled -> ~ pi * 80^2 = 20106
    assert 0.8 * np.pi * 80 ** 2 < area < 1.3 * np.pi * 80 ** 2
    ys, xs = np.where(label[..., 0] > 0)
    assert abs(ys.mean() - PANE // 2) < 10
    assert abs(xs.mean() - PANE // 2) < 10


def test_extract_end_to_end(tmp_path):
    path = str(tmp_path / 'shot.png')
    cv2.imwrite(path, make_collage(with_label=True))
    result = ex.extract(path, None, include_label=True)
    assert set(result) == {'DCEE', 'DCEL', 'DWI', 'ADC', 'TRA', 'label'}
    # pane contents map to the right sequences (values from make_collage)
    assert int(np.median(result['DCEE'])) == 58   # row0 col1: 50 + 8*1
    assert int(np.median(result['TRA'])) == 90    # row1 col2: 50 + 8*5
    assert (result['label'] > 0).sum() > 0


def test_extract_all_tree(tmp_path):
    for category, with_label in (('cancer', True), ('healthy', False)):
        exam = tmp_path / category / '1' / '1'
        exam.mkdir(parents=True)
        cv2.imwrite(str(exam / '01.png'), make_collage(with_label=with_label))
    ex.extract_all(str(tmp_path), num_workers=0)
    for t in ('TRA', 'ADC', 'DWI', 'DCEE', 'DCEL', 'label'):
        assert os.path.exists(tmp_path / 'cancer' / '1' / '1' / t / '01.png')
    assert os.path.exists(tmp_path / 'healthy' / '1' / '1' / 'TRA' / '01.png')
    assert not os.path.exists(tmp_path / 'healthy' / '1' / '1' / 'label')
