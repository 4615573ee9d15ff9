from .facodec import (
    FACodecEncoderV2Model,
    NS3TransformerEncoder,
    ProsodyExtractor,
    ns3_decoder_prosody_params_from_torch,
    ns3_encoder_params_from_torch,
    ns3_mel_spectrogram,
)

__all__ = [
    "FACodecEncoderV2Model",
    "NS3TransformerEncoder",
    "ProsodyExtractor",
    "ns3_decoder_prosody_params_from_torch",
    "ns3_encoder_params_from_torch",
    "ns3_mel_spectrogram",
]
