"""Step operator library: lazy Spark-DataFrame transforms."""

from recipys_spark.operators.base import Accumulator, Step, StepFunction
from recipys_spark.operators.historical import StepHistorical, StepRolling
from recipys_spark.operators.impute import (
    StepImputeFastForwardFill,
    StepImputeFastZeroFill,
    StepImputeFill,
    StepImputeModel,
)
from recipys_spark.operators.timeseries import (
    StepLag,
    StepLead,
    StepResampling,
    StepSessionize,
)
from recipys_spark.operators.asof import StepAsofJoin, asof_join
from recipys_spark.operators.scale import (
    StepBinarize,
    StepKBinsDiscretize,
    StepMaxAbsScale,
    StepMinMaxScale,
    StepNormalize,
    StepQuantileTransform,
    StepRobustScale,
    StepScale,
)
from recipys_spark.operators.encode import (
    StepLabelBinarize,
    StepLabelEncode,
    StepMissingIndicator,
    StepOneHotEncode,
    StepOrdinalEncode,
)
from recipys_spark.operators.mathtrans import (
    StepLog1p,
    StepPolynomialFeatures,
    StepPowerTransform,
    StepSpline,
)
from recipys_spark.operators.sklearn_compat import StepSklearn

__all__ = [
    "Accumulator",
    "Step",
    "StepAsofJoin",
    "StepBinarize",
    "StepFunction",
    "StepHistorical",
    "StepImputeFastForwardFill",
    "StepImputeFastZeroFill",
    "StepImputeFill",
    "StepImputeModel",
    "StepKBinsDiscretize",
    "StepLabelBinarize",
    "StepLabelEncode",
    "StepLag",
    "StepLog1p",
    "StepLead",
    "StepMaxAbsScale",
    "StepMinMaxScale",
    "StepMissingIndicator",
    "StepNormalize",
    "StepOneHotEncode",
    "StepOrdinalEncode",
    "StepPolynomialFeatures",
    "StepPowerTransform",
    "StepQuantileTransform",
    "StepResampling",
    "StepRolling",
    "StepRobustScale",
    "StepScale",
    "StepSessionize",
    "StepSklearn",
    "StepSpline",
    "asof_join",
]
