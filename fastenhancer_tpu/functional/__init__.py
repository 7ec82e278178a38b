from .stft import (
    STFTConfig,
    stft,
    istft,
    compress,
    uncompress,
    compressed_stft,
    compressed_istft,
    stft_streaming_step,
    istft_streaming_step,
    stft_streaming_chunk,
    istft_streaming_chunk,
    stream_stft,
    stream_istft,
    init_stft_carry,
    init_istft_carry,
    make_window,
    padded_window,
    ola_window_sq_sum,
    frame_signal,
    overlap_add,
)
from .mask import get_mask
from .mel import spec_to_mel, mel_fbank_weights

__all__ = [
    "STFTConfig", "stft", "istft", "compress", "uncompress",
    "compressed_stft", "compressed_istft",
    "stft_streaming_step", "istft_streaming_step",
    "stft_streaming_chunk", "istft_streaming_chunk",
    "stream_stft", "stream_istft", "init_stft_carry", "init_istft_carry",
    "make_window", "padded_window", "ola_window_sq_sum",
    "frame_signal", "overlap_add", "get_mask", "spec_to_mel", "mel_fbank_weights",
]
