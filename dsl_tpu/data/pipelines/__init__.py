from dsl_tpu.data.pipelines.compose import Compose  # noqa: F401
from dsl_tpu.data.pipelines import loading  # noqa: F401
from dsl_tpu.data.pipelines import transforms  # noqa: F401
from dsl_tpu.data.pipelines import strong_aug  # noqa: F401
from dsl_tpu.data.pipelines import extra_transforms  # noqa: F401
from dsl_tpu.data.pipelines import fillin_transforms  # noqa: F401
from dsl_tpu.data.pipelines import geometric  # noqa: F401
