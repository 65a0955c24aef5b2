from controllable_xgating_tpu.models.encoder import (
    EncoderParams,
    encode,
    init_encoder,
)
from controllable_xgating_tpu.models.pos_generator import (
    PosGeneratorParams,
    init_pos_generator,
    pos_forward,
    pos_greedy_generate,
    psi_from_tags,
)
from controllable_xgating_tpu.models.decoder import (
    DecoderParams,
    DecodeContext,
    decode_step,
    decoder_forward,
    init_decoder,
    make_decode_context,
)
from controllable_xgating_tpu.models.captioner import (
    CaptionerParams,
    init_captioner,
    xe_logits,
)

__all__ = [
    "EncoderParams",
    "encode",
    "init_encoder",
    "PosGeneratorParams",
    "init_pos_generator",
    "pos_forward",
    "pos_greedy_generate",
    "psi_from_tags",
    "DecoderParams",
    "DecodeContext",
    "decode_step",
    "decoder_forward",
    "init_decoder",
    "make_decode_context",
    "CaptionerParams",
    "init_captioner",
    "xe_logits",
]
