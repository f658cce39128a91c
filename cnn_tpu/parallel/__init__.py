from cnn_tpu.parallel.mesh import make_mesh  # noqa: F401
from cnn_tpu.parallel.pipeline import (  # noqa: F401
    make_pp_eval_step,
    make_pp_train_step,
    pp_decompose,
    shard_pp_train_state,
)
from cnn_tpu.parallel.train_step import (  # noqa: F401
    TrainState,
    create_train_state,
    make_ensemble_eval_step,
    make_eval_step,
    make_forward,
    make_train_step,
    shard_train_state,
)
