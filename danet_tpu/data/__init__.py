import danet_tpu.data.dataset  # noqa: F401
import danet_tpu.data.timit  # noqa: F401
import danet_tpu.data.wsj0  # noqa: F401
from danet_tpu.data.dataset import Dataset, WhiteNoiseData  # noqa: F401
import danet_tpu.data.synth  # noqa: F401
import danet_tpu.data.synth_speech  # noqa: F401
import danet_tpu.data.wavdir  # noqa: F401
