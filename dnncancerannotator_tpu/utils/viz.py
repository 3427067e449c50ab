'''Visualization / export callback.

Parity with the reference ``Visualizer`` callback (reference:
annotator/utils/callbacks.py:55-446), the observability workhorse:

- segmentation image grids (feature channels ‖ label ‖ prediction, optional
  RGB overlay, callbacks.py:431-446) written as TB image summaries with tags
  ``path:<exam path>,sliceID:<n>`` (callbacks.py:416-420);
- pixel and region PR curves as raw-data ``pr_curves`` plugin summaries
  (callbacks.py:190-204, :212-231);
- input-sensitivity analysis: |d(output)/d(input)| summed per channel,
  normalized per sample, rendered as a bar chart (callbacks.py:291-299,
  :352-367) — computed with ``jax.grad`` instead of GradientTape;
- PNG/CSV export tree mirroring the dataset directory structure under
  ``save_dir/<tag>/{images,csv}/<last depth path parts>/<sliceNN>/step_*``
  (callbacks.py:369-403);
- per-case region-metric rows accumulated into a shared container
  (callbacks.py:319-344).
'''

import os

import jax
import jax.numpy as jnp
import numpy as np

from ..data import augment as augment_mod
from ..metrics import pixel as pixel_metrics
from ..metrics import region as region_metrics
from ..ops import gates as gates_lib
from ..parallel import mesh as mesh_lib
from . import tboard


class Visualizer:
    def __init__(
        self,
        tag,
        data,
        freq,
        save_dir,
        ratio=0.5,
        prediction_threshold=None,
        pr_nthreshold=100,
        pr_region_nthreshold=100,
        pr_IoU_threshold=0.30,
        ignore_test=True,
        export_images=False,
        export_csv=False,
        visualize_sensitivity=False,
        export_path_depth=3,
        overlay=False,
        export_casewise_metrics=False,
        casewise_metrics_container=None,
    ):
        self.tag = tag
        self.data = data
        self.freq = freq
        self.save_dir = save_dir
        self.ratio = ratio
        self.prediction_threshold = prediction_threshold
        self.pr_nthreshold = pr_nthreshold
        self.pr_region_nthreshold = pr_region_nthreshold
        self.pr_IoU_threshold = pr_IoU_threshold
        self.export_images = export_images
        self.export_csv = export_csv
        self.show_sensitivity = visualize_sensitivity
        self.export_path_depth = export_path_depth
        self.overlay = overlay
        self.export_casewise_metrics = export_casewise_metrics
        self.casewise_metrics_container = casewise_metrics_container
        self.ignore_test = ignore_test
        self._writer = None
        self._owned_writer = True
        self._viz_step = None

    # -- writer sharing/ownership (reference callbacks.py:153-167) -------
    @property
    def writer(self):
        '''Lazily opened event-file writer; owned unless one was assigned.'''
        if self._writer is None:
            self._writer = tboard.SummaryWriter(
                os.path.join(self.save_dir, self.tag))
            self._owned_writer = True
        return self._writer

    @writer.setter
    def writer(self, writer):
        if self._writer is not None and self._owned_writer:
            self._writer.close()
        self._writer = writer
        self._owned_writer = False

    # ------------------------------------------------------------------
    def _build_viz_step(self, engine):
        slice_types = self.data.slice_types
        model = engine.model
        has_bn = engine._has_bn
        with_sens = self.show_sensitivity

        mesh = engine.mesh
        kernel_gates = engine.kernel_gates

        def fn(state, raw_batch):
            with mesh_lib.pallas_spmd(mesh), gates_lib.active(kernel_gates):
                return body(state, raw_batch)

        def body(state, raw_batch):
            images = raw_batch.astype(jnp.float32) / 255.0
            x, y = augment_mod.to_feature_label(images, slice_types)
            variables = {'params': state['params']}
            if has_bn:
                variables['batch_stats'] = state['batch_stats']

            def forward(x_):
                return model.apply(variables, x_, training=False)

            probs = forward(x)
            if with_sens:
                grad = jax.grad(lambda x_: jnp.sum(forward(x_)))(x)
                summed = jnp.sum(jnp.abs(grad), axis=(1, 2))  # [B, C]
                sens = summed / jnp.maximum(
                    jnp.sum(summed, axis=1, keepdims=True), 1e-12)
            else:
                sens = jnp.zeros((x.shape[0], x.shape[-1]))
            return x, y, probs, sens

        return jax.jit(fn)

    # ------------------------------------------------------------------
    def on_step(self, engine, step, logs=None):
        '''Run the full visualization pass for one checkpoint/step.

        Skips steps off the ``freq`` cadence (reference on_epoch_end gate,
        callbacks.py:178).
        '''
        if self.freq and step % self.freq != 0:
            return
        self._run(engine, step, logs)

    def on_test(self, engine, step, logs=None):
        '''Visualization hook for evaluation passes: no-op when
        ``ignore_test`` (the train-time default, reference
        callbacks.py:262-281), and not subject to ``freq``.'''
        if self.ignore_test:
            return
        self._run(engine, step, logs)

    def _run(self, engine, step, logs=None):
        if self._viz_step is None:
            self._viz_step = self._build_viz_step(engine)

        pixel_thresholds = [
            i / float(self.pr_nthreshold - 1) for i in range(self.pr_nthreshold)]
        region_thresholds = [
            i / float(self.pr_region_nthreshold - 1)
            for i in range(self.pr_region_nthreshold)]
        pixel_suite = {
            'true_positive_counts': pixel_metrics.TruePositives(pixel_thresholds),
            'true_negative_counts': pixel_metrics.TrueNegatives(pixel_thresholds),
            'false_positive_counts': pixel_metrics.FalsePositives(pixel_thresholds),
            'false_negative_counts': pixel_metrics.FalseNegatives(pixel_thresholds),
            'recall': pixel_metrics.Recall(pixel_thresholds),
            'precision': pixel_metrics.Precision(pixel_thresholds),
        }
        region_cm = region_metrics.RegionBasedConfusionMatrix(
            region_thresholds, self.pr_IoU_threshold,
            resize_factor=self.ratio)

        for batch in self.data.batches():
            raw = batch['slices']
            raw_dev, n = mesh_lib.shard_batch(
                engine.mesh, raw, pad_to=self.data.batch_size)
            x, y, probs, sens = self._viz_step(engine.state, raw_dev)
            x = np.asarray(x)[:n]
            y = np.asarray(y)[:n]
            probs = np.asarray(probs)[:n]
            sens = np.asarray(sens)[:n]

            for metric in pixel_suite.values():
                metric.update_state(y, probs)
            # single region pass: accumulate the PR-curve confusion and keep
            # the per-image rows when the casewise export needs them
            if self.export_casewise_metrics:
                tp_raw, fn_raw, fp_raw = region_cm.update_state_raw(y, probs)
            else:
                region_cm.update_state(y, probs)
                tp_raw = fn_raw = fp_raw = [None] * n

            for i in range(n):
                meta = batch['meta'][i]
                tag = f"path:{meta['path']},sliceID:{meta['sliceID']}"
                image = self._generate_image(x[i], y[i], probs[i])
                image = self._resize(image)
                self.writer.image(tag, image, step)
                self._export_files(
                    meta, image, step,
                    sens[i] if self.show_sensitivity else None,
                    (tp_raw[i], fn_raw[i], fp_raw[i], region_thresholds, tag)
                    if self.export_casewise_metrics else None)

        self._record_pr_curves(pixel_suite, region_cm, step)
        if logs:
            self.record_logs(logs, step)
        self.writer.flush()

    # ------------------------------------------------------------------
    def _generate_image(self, features, label, output):
        '''features [h,w,C], label [h,w], output [h,w,1] -> grid image
        (reference callbacks.py:431-446).'''
        assert features.ndim == 3
        horizontal = np.concatenate(
            [features[..., c] for c in range(features.shape[-1])], axis=1)
        pred = output[..., 0]
        if self.prediction_threshold is not None:
            pred = (pred > self.prediction_threshold).astype(pred.dtype)
        if self.overlay:
            horizontal = np.tile(horizontal[..., None], [1, 1, 3])
            f0 = features[..., 0]
            pred = np.stack([pred, f0, f0], axis=-1)
            lab = np.stack([label, f0, f0], axis=-1)
            return np.concatenate([horizontal, lab, pred], axis=1)
        return np.concatenate([horizontal, label, pred], axis=1)

    def _resize(self, image):
        if self.ratio == 1.0:
            return image
        from PIL import Image
        arr = np.clip(image * 255.0, 0, 255).astype(np.uint8)
        h = int(arr.shape[0] * self.ratio)
        w = int(arr.shape[1] * self.ratio)
        mode = 'L' if arr.ndim == 2 else 'RGB'
        img = Image.fromarray(arr, mode=mode).resize((w, h), Image.BILINEAR)
        return np.asarray(img).astype(np.float32) / 255.0

    def _export_files(self, meta, image, step, sensitivity, casewise):
        import pandas as pd
        parts = meta['path'].split('/')[-self.export_path_depth:]
        slice_num = int(meta['sliceID'])
        if self.export_images:
            path = os.path.join(
                self.save_dir, self.tag, 'images', *parts,
                f'{slice_num:02d}', f'step_{int(step):08d}.png')
            os.makedirs(os.path.dirname(path), exist_ok=True)
            with open(path, 'wb') as f:
                f.write(tboard.encode_png(image))
            if sensitivity is not None:
                sense_img = self._sensitivity_chart(
                    sensitivity, meta['slice_types'])
                spath = os.path.join(
                    self.save_dir, self.tag, 'images', *parts,
                    f'{slice_num:02d}', f'step_{int(step):08d}_sensitivity.png')
                with open(spath, 'wb') as f:
                    f.write(tboard.encode_png(sense_img))
        if self.export_csv:
            if sensitivity is not None:
                names = [t for t in meta['slice_types'] if t != 'label']
                series = pd.Series(sensitivity[:len(names)], index=names)
                cpath = os.path.join(
                    self.save_dir, self.tag, 'csv', *parts,
                    f'{slice_num:02d}', f'step_{int(step):08d}_sensitivity.csv')
                os.makedirs(os.path.dirname(cpath), exist_ok=True)
                series.to_csv(cpath)
        if casewise is not None:
            tp, fn, fp, thresholds, tag = casewise
            row = dict(
                **{f'region_tp@PixelThreshold{t:.2}': int(v)
                   for t, v in zip(thresholds, tp)},
                **{f'region_fn@PixelThreshold{t:.2}': int(v)
                   for t, v in zip(thresholds, fn)},
                **{f'region_fp@PixelThreshold{t:.2}': int(v)
                   for t, v in zip(thresholds, fp)},
                tag=tag,
            )
            if self.casewise_metrics_container is not None:
                self.casewise_metrics_container.append(row)
            if self.export_csv:
                mpath = os.path.join(
                    self.save_dir, self.tag, 'csv', *parts,
                    f'{slice_num:02d}', f'step_{int(step):08d}_metrics.csv')
                os.makedirs(os.path.dirname(mpath), exist_ok=True)
                pd.DataFrame([row]).T.to_csv(mpath)

    def _sensitivity_chart(self, sensitivity, slice_types):
        '''Bar chart of per-channel sensitivity -> RGB image array.'''
        import matplotlib
        matplotlib.use('Agg')
        from matplotlib.backends.backend_agg import FigureCanvasAgg
        from matplotlib.figure import Figure
        names = [t for t in slice_types if t != 'label']
        fig = Figure()
        canvas = FigureCanvasAgg(fig)
        ax = fig.gca()
        ax.bar(range(len(names)), sensitivity[:len(names)], tick_label=names)
        ax.set_ylim(0, 1)
        ax.set_xlabel('modality')
        ax.set_ylabel('normalized sensitivity')
        canvas.draw()
        buf = np.asarray(canvas.buffer_rgba())[:, :, :3]
        return buf

    def _record_pr_curves(self, pixel_suite, region_cm, step):
        pixel_data = {k: np.asarray(m.result())
                      for k, m in pixel_suite.items()}
        self.writer.pr_curve_raw(
            'pixel/PR_curve', pixel_data['true_positive_counts'],
            pixel_data['false_positive_counts'],
            pixel_data['true_negative_counts'],
            pixel_data['false_negative_counts'],
            pixel_data['precision'], pixel_data['recall'],
            self.pr_nthreshold, step)
        region = region_cm.result_dict()
        self.writer.pr_curve_raw(
            'region/PR_curve', region['true_positive_counts'],
            region['false_positive_counts'],
            np.zeros(self.pr_region_nthreshold),
            region['false_negative_counts'],
            region['precision'], region['recall'],
            self.pr_region_nthreshold, step)

    def record_logs(self, logs, step):
        for name, value in logs.items():
            if np.ndim(value) == 0:
                self.writer.scalar(name, float(value), step)
        self.writer.flush()

    def close(self):
        if self._writer is not None and self._owned_writer:
            self._writer.close()
            self._writer = None
