'''Measure HOST-side streaming input throughput (no device work).

The bench's small-model operating point consumes ~2210 slices/s/chip from
the HBM-resident pool; any dataset too big for that pool falls back to the
streaming path (TrainDataset.raw_batches -> _Prefetcher), whose ceiling is
this host's 1 vCPU. This tool measures that ceiling: TFRecord scan + native
exam decode (optionally pooled) + host pre-crop + shuffle + batch assembly,
with NO jax/device involvement, so it can run while the TPU relay is down.

Usage: python tools/bench_host_pipeline.py [--size 512] [--exams 24]
           [--batch 8] [--batches 200] [--pool auto]
'''

import argparse
import sys
import tempfile
import time

sys.path.insert(0, '.')


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--size', type=int, default=512)
    ap.add_argument('--exams', type=int, default=24,
                    help='exams per source (2 sources)')
    ap.add_argument('--slices', type=int, default=20, help='slices per exam')
    ap.add_argument('--batch', type=int, default=8)
    ap.add_argument('--batches', type=int, default=200)
    ap.add_argument('--pool', default='auto')
    ap.add_argument('--crop', type=int, default=256,
                    help='train crop (host pre-crop ships crop+12 windows)')
    args = ap.parse_args()

    import numpy as np
    from dnncancerannotator_tpu.data import pipeline
    from dnncancerannotator_tpu.data import tfrecord as tfr

    tmp = tempfile.mkdtemp(prefix='hostbench_')
    rng = np.random.default_rng(0)
    paths = []
    for name in ('cancer', 'healthy'):
        path = f'{tmp}/{name}.tfrecords'
        with open(path, 'wb') as f:
            for ei in range(args.exams):
                slices = rng.integers(
                    0, 255, (args.slices, args.size, args.size, 6),
                    dtype=np.uint8)
                example = tfr.encode_example({
                    'slices': tfr.serialize_tensor(slices),
                    'patientID': ei, 'examID': ei,
                    'path': f'{name}/{ei}'.encode(),
                    'category': name.encode(),
                    'shape': list(slices.shape),
                    'slice_types': [t.encode() for t in (
                        'TRA', 'ADC', 'DWI', 'DCEE', 'DCEL', 'label')],
                })
                tfr.write_record(f, example)
        paths.append(path)

    ds = pipeline.train_ds(
        paths, batch_size=args.batch, buffer_size=64,
        slice_types=('TRA', 'ADC', 'DWI', 'DCEE', 'DCEL', 'label'),
        output_size=(args.crop, args.crop), base_size=args.size,
        augment_options={'random_crop': {
            'output_size': [args.crop, args.crop]}},
        decode_pool=args.pool)
    total_slices = 2 * args.exams * args.slices
    it = ds.raw_batches(seed=0)
    # cold phase: epoch 1 decodes everything; on this host the cost is
    # dominated by first-touch page-fault service of the dataset footprint
    # (measured ~0.1 GB/s sustained — see utils/hostmem.py)
    t0 = time.perf_counter()
    n = 0
    cold_batches = max(total_slices // args.batch - 4, 1)
    for _ in range(cold_batches):
        b = next(it)
        n += b.shape[0]
    dt = time.perf_counter() - t0
    print(f'cold epoch-1: {n / dt:.0f} slices/s')
    # warm phase: exam LRU caches hit; this is the steady-state regime for
    # datasets under the per-reader cache budget
    for _ in range(16):
        next(it)
    t0 = time.perf_counter()
    n = 0
    for _ in range(args.batches):
        b = next(it)
        n += b.shape[0]
    dt = time.perf_counter() - t0
    print(f'warm steady-state: {n / dt:.0f} slices/s '
          f'({dt * 1e3 / args.batches:.2f} ms/batch of {args.batch}, '
          f'element {b.shape}, pool={ds.decode_pool})')


if __name__ == '__main__':
    main()
