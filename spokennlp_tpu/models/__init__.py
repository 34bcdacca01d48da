from spokennlp_tpu.models.encoder import Encoder, EncoderOutput

__all__ = ["Encoder", "EncoderOutput"]
