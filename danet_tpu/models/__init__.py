from danet_tpu.models.base import Encoder, Estimator, ModelModule, Separator  # noqa: F401
import danet_tpu.models.encoders  # noqa: F401
import danet_tpu.models.estimators  # noqa: F401
import danet_tpu.models.separators  # noqa: F401
from danet_tpu.models.danet import DaNet  # noqa: F401
from danet_tpu.models.tasnet import TasNet  # noqa: F401
