from .pipeline import EvalDataset, TrainDataset, base, eval_ds, predict_ds, train_ds
from .records import generate_tfrecords
from . import augment, records, tfrecord
