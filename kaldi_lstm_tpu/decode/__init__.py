from kaldi_lstm_tpu.decode.viterbi import PhoneLoopGraph, viterbi_decode
from kaldi_lstm_tpu.decode.wer import EditStats, edit_distance, wer_report

__all__ = ["PhoneLoopGraph", "viterbi_decode", "EditStats",
           "edit_distance", "wer_report"]
