'''Screenshot extraction: clinical collage -> per-sequence PNG tree.

Parity with the reference extractor (reference: annotator/runs/extract.py):
clinical screenshots are 2x3 grids of MRI sequences plus a hand-annotated
label pane. The pipeline:

1. detect the grid geometry with an orthogonal-corner convolution detector
   (extract.py:26-57, :60-151) — here the conv can run as a jitted JAX op
   (``use_jax=True``, the analog of the reference's optional TF conv) or via
   scipy on host;
2. tile the six panes and map them to {label, DCEE, DCEL, DWI, ADC, TRA}
   (extract.py:292-295);
3. for cancer exams, convert the colored hand annotation to a filled binary
   mask: erase ruler lines found by probabilistic Hough, keep the central
   region, split into connected components, morphologically close each, and
   fill the outer contours (extract.py:196-245);
4. fan the per-slice work across a process pool (extract.py:364-368).

This stage is offline host-side preprocessing (OpenCV), matching the
reference's placement outside the accelerator path.
'''

import logging
import os
from glob import glob

import numpy as np

logger = logging.getLogger(__name__)


def get_orthogonal_detector(size=200, non_orthogonal_penalty=10):
    '''Conv filter responding to an upper-left orthogonal corner of a bright
    grid line (reference extract.py:26-36).'''
    filt = np.zeros([size, size], np.float32)
    filt[1, :] = -non_orthogonal_penalty
    filt[:, 1] = -non_orthogonal_penalty
    filt[0, :] = 1
    filt[:, 0] = 1
    return filt


def _conv2d_valid(img, filt, use_jax=False):
    if use_jax:
        import jax
        import jax.numpy as jnp
        from jax import lax
        # lax conv is correlation (no kernel flip), so pass the filter as-is;
        # the scipy path flips once to cancel convolve2d's internal flip.
        out = lax.conv_general_dilated(
            jnp.asarray(img, jnp.float32)[None, :, :, None],
            jnp.asarray(filt, jnp.float32)[:, :, None, None],
            window_strides=(1, 1), padding='VALID',
            dimension_numbers=('NHWC', 'HWIO', 'NHWC'))
        return np.asarray(out[0, :, :, 0])
    from scipy import signal
    return signal.convolve2d(img, np.flip(filt), 'valid')


def _find_top_left_fallback(gray):
    '''Scanline fallback when conv corner detection fails
    (reference extract.py:39-57).'''
    row = 120
    while np.sum(gray[row, 100:700]) != 0:
        row += 1
    col = 120
    while np.sum(gray[250:800, col]) != 0:
        col -= 1
    return row + 3, col - 75


def detect_internals(
    collective_img,
    num_internals=6,
    conv_filter_size=25,
    separator_value=100,
    nboxes_horizontal=3,
    min_box_size=500,
    use_jax=False,
):
    '''Locate the 6 internal panes; returns boxes (startx, starty, endx, endy).'''
    gray = collective_img[:, :, 0].copy()
    gray[-1, :] = 255
    gray[:, -1] = 255
    binary = (gray >= separator_value).astype(np.float32)
    filt = get_orthogonal_detector(conv_filter_size)

    def corners(f, adjust, rank):
        conv = _conv2d_valid(binary, f, use_jax=use_jax)
        thr = np.partition(conv.ravel(), -rank)[-rank]
        xs, ys = np.where(conv >= thr)
        return list(zip(xs + adjust, ys + adjust))

    start_candidates = corners(filt, 0, 1)
    end_candidates = corners(np.flip(filt), conv_filter_size, 3)

    box_size = None
    if start_candidates and end_candidates:
        start = np.array(min(start_candidates))
        ends = [e for e in end_candidates
                if np.all(np.array(e) > (start + min_box_size))]
        if not ends:
            raise ValueError(
                f'Failed to detect end corner. start={start}, '
                f'ends={end_candidates}')
        end = np.array(min(ends))
        box_size = end - start
        if (box_size.min() <= min_box_size
                or (box_size[0] * 2) * 0.96 > collective_img.shape[0]
                or (box_size[1] * 3) * 0.96 > collective_img.shape[1]):
            raise ValueError(
                f'Invalid box size {box_size} (start={start}, end={end})')
        while start[0] > 200:
            start[0] -= box_size[0]
        while start[1] > 60:
            start[1] -= box_size[1]
        start = np.maximum(start, 0)
    else:
        start = np.array(_find_top_left_fallback(gray))
        logger.warning(
            'Corner detection fell back to scanline; start=(%d, %d)',
            start[0], start[1])
        if start.min() < 0:
            raise ValueError('Failed to detect corners')

    anchor = start.copy()
    boxes = []
    for i in range(num_internals):
        boxes.append((*anchor, *(anchor + box_size)))
        if (i + 1) % nboxes_horizontal == 0:
            anchor = np.array((start[0] + box_size[0], start[1]))
        else:
            anchor = np.array((anchor[0], anchor[1] + box_size[1]))
    return boxes


def _monochrome_mask(img):
    return np.logical_and(
        img[:, :, 0] == img[:, :, 1], img[:, :, 1] == img[:, :, 2])


def _center_mask(shape, radius=130):
    import cv2
    mask = np.zeros(shape, np.uint8)
    cv2.circle(mask, (shape[1] // 2, shape[0] // 2), radius,
               color=255, thickness=-1)
    return mask


def label_exists(label_img):
    '''True if the label pane has colored (annotated) pixels near center.'''
    color = np.logical_not(_monochrome_mask(label_img))
    masked = np.logical_and(
        _center_mask(label_img.shape[:2] + (1,))[..., 0] > 0, color)
    return masked.sum() > 0


def extract_label(label_img, line_eraser_thickness=3, minLineLength=100,
                  kernel_size=9, iterations=1):
    '''Colored annotation -> filled binary mask (reference extract.py:196-245).'''
    import cv2
    color = (np.logical_not(_monochrome_mask(label_img))[..., None]
             .astype(np.uint8) * 255)
    nolines = color.copy()
    hough = cv2.HoughLinesP(color, 0.5, np.pi / 1800, 50,
                            minLineLength=minLineLength, maxLineGap=2)
    if hough is not None:
        for x0, y0, x1, y1 in np.squeeze(hough, 1):
            cv2.line(nolines, (x0, y0), (x1, y1), 0, line_eraser_thickness)

    masked = np.logical_and(
        _center_mask(nolines.shape) > 0, nolines > 0).astype(np.uint8) * 255

    nmarkers, markers = cv2.connectedComponents(masked[..., 0])
    closed = np.zeros(masked.shape[:2], np.uint8)
    kernel = np.ones([kernel_size] * 2, np.uint8)
    for marker_id in range(1, nmarkers):
        comp = (markers == marker_id).astype(np.uint8) * 255
        closed = closed + cv2.morphologyEx(
            comp, cv2.MORPH_CLOSE, kernel, iterations=iterations)
    closed = closed[..., None]

    contours, _ = cv2.findContours(
        closed, cv2.RETR_EXTERNAL, cv2.CHAIN_APPROX_SIMPLE)
    label = np.zeros(color.shape, np.uint8)
    cv2.fillPoly(label, contours, 255)
    return label


def extract(path, output, include_label=False,
            include_label_comparison=False, kernel_size=5, iterations=7,
            use_jax=False):
    '''Extract one collage into per-sequence images (reference extract.py:259-309).'''
    import cv2
    img = cv2.imread(path)
    assert img is not None, f'failed to load {path}'
    try:
        boxes = detect_internals(img, use_jax=use_jax)
    except ValueError as exc:
        raise ValueError(f'Failed to detect corners: {path}') from exc
    panes = [img[sx:ex, sy:ey] for sx, sy, ex, ey in boxes]

    result = {'DCEE': panes[1], 'DCEL': panes[2],
              'DWI': panes[3], 'ADC': panes[4], 'TRA': panes[5]}
    if include_label:
        assert label_exists(panes[0]), f"{path} doesn't seem to have a label"
        result['label'] = extract_label(
            panes[0], kernel_size=kernel_size, iterations=iterations)
    else:
        assert not label_exists(panes[0])

    if include_label_comparison:
        assert include_label
        gray = cv2.cvtColor(panes[0], cv2.COLOR_BGR2GRAY)[..., None]
        result['label_comparison'] = np.concatenate(
            [gray, result['label']], axis=1)

    if output is not None:
        os.makedirs(output, exist_ok=True)
        for tag, out_img in result.items():
            cv2.imwrite(os.path.join(output, f'{tag}.png'), out_img)
    return result


def process_slice(args):
    import cv2
    (slice_, exam, dry, include_label, debug, kernel_size, iterations,
     use_jax) = args
    results = extract(
        os.path.join(exam, slice_), None,
        include_label=include_label, include_label_comparison=debug,
        kernel_size=kernel_size, iterations=iterations, use_jax=use_jax)
    for kind, img in results.items():
        if dry:
            continue
        kind_dir = os.path.join(exam, kind)
        os.makedirs(kind_dir, exist_ok=True)
        cv2.imwrite(os.path.join(kind_dir, slice_), img)


def list_exams(path, extension='png'):
    path = path.rstrip(os.path.sep)

    def supported(name):
        return os.path.splitext(name)[1][1:].lower() == extension

    return {
        exam: sorted(filter(supported, os.listdir(exam)))
        for exam in glob(os.path.join(path, '*', '*'))
        if any(map(supported, os.listdir(exam)))
    }


def extract_all(path, dry=False, debug=False, kernel_size=5, iterations=7,
                use_jax=False, num_workers=None):
    '''
    Extract individual images (TRA, ADC, etc.) from the screenshots
    under the specified directory.

    Args:
        path: directory which contains screenshots, structured as
            path/{healthy,cancer}/patientID/examID/<sliceID>.png
        dry (bool): dry run; make no changes to disk
        debug (bool): also output a label-comparison debug image
        kernel_size (int): kernel size for segmentation-map inference
        iterations (int): iterations of dilate/erode ops
        use_jax (bool): run the corner-detector convolution with JAX
        num_workers (int): process-pool size (default: cpu count)
    '''
    assert os.path.exists(path)
    healthy_path = os.path.join(path, 'healthy')
    cancer_path = os.path.join(path, 'cancer')
    assert os.path.exists(healthy_path) and os.path.exists(cancer_path)

    tasks = []
    for exam, slices in list_exams(healthy_path).items():
        for s in slices:
            tasks.append((s, exam, dry, False, False, kernel_size,
                          iterations, use_jax))
    for exam, slices in list_exams(cancer_path).items():
        for s in slices:
            tasks.append((s, exam, dry, True, debug, kernel_size,
                          iterations, use_jax))

    if num_workers == 0 or len(tasks) <= 1:
        for t in tasks:
            process_slice(t)
    else:
        from multiprocessing import Pool, cpu_count
        with Pool(num_workers or cpu_count()) as pool:
            pool.map(process_slice, tasks)
    logger.info('Extracted %d slices', len(tasks))
