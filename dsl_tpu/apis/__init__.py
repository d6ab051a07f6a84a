from dsl_tpu.apis.train import (  # noqa: F401
    build_dataset, set_random_seed, train_detector)
from dsl_tpu.apis.test import single_device_test  # noqa: F401
from dsl_tpu.apis.inference import (  # noqa: F401
    inference_detector, init_detector, show_result)
