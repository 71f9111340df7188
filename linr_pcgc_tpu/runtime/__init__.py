from .overfit import (
    TrainConfig,
    GopBatch,
    assemble_gop,
    make_epoch_fn,
    adam_init,
    save_checkpoint,
    load_checkpoint,
    overfit_gop,
)
from .codec import encode_gop, decode_gop, encode_frame, decode_frame
