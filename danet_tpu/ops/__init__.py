from danet_tpu.ops import dsp, loss, nn, rnn  # noqa: F401
