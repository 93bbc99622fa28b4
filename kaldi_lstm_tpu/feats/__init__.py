from kaldi_lstm_tpu.feats.fbank import (
    FrameOptions,
    MelOptions,
    FbankOptions,
    MfccOptions,
    compute_fbank,
    compute_mfcc,
    mel_banks,
    num_frames,
)

__all__ = [
    "FrameOptions", "MelOptions", "FbankOptions", "MfccOptions",
    "compute_fbank", "compute_mfcc", "mel_banks", "num_frames",
]
