'''Metric registry / resolution.

``solve_metric`` resolves the YAML metric specs from config
(reference: annotator/utils/metrics.py:19-34) — either a plain string or a
single-item dict ``{ClassName: {options...}}`` — into metric instances.
'''

from .pixel import (
    AUC, FalseNegatives, FalsePositives, FBetaScore, Mean, Precision, Recall,
    TrueNegatives, TruePositives,
)
from .region import (
    RegionBasedConfusionMatrix, RegionBasedFalseNegatives,
    RegionBasedFalsePositives, RegionBasedFBetaScore, RegionBasedPrecision,
    RegionBasedRecall, RegionBasedTruePositives, region_confusion_batch,
)

_REGISTRY = {
    'Precision': Precision,
    'Recall': Recall,
    'AUC': AUC,
    'TruePositives': TruePositives,
    'FalsePositives': FalsePositives,
    'TrueNegatives': TrueNegatives,
    'FalseNegatives': FalseNegatives,
    'FBetaScore': FBetaScore,
    'RegionBasedPrecision': RegionBasedPrecision,
    'RegionBasedRecall': RegionBasedRecall,
    'RegionBasedTruePositives': RegionBasedTruePositives,
    'RegionBasedFalsePositives': RegionBasedFalsePositives,
    'RegionBasedFalseNegatives': RegionBasedFalseNegatives,
    'RegionBasedFBetaScore': RegionBasedFBetaScore,
    'RegionBasedConfusionMatrix': RegionBasedConfusionMatrix,
}


def solve_metric(metric_spec):
    '''Resolve a metric spec (str or {name: options}) to an instance.'''
    if isinstance(metric_spec, str):
        name, options = metric_spec, {}
    elif isinstance(metric_spec, dict):
        assert len(metric_spec) == 1
        name, options = list(metric_spec.items())[0]
        options = options or {}
    else:
        raise ValueError(f'Bad metric spec: {metric_spec!r}')
    if name not in _REGISTRY:
        raise KeyError(f'Unknown metric {name!r}. Available: {sorted(_REGISTRY)}')
    return _REGISTRY[name](**options)
