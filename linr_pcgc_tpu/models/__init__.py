from .network import (
    ModelConfig,
    init_params,
    param_count,
    flatten_params,
    unflatten_params,
    scale_input_lut,
    forward_all_stages,
    training_bits,
    level_context,
    stage_logits,
)
