"""Unit tests for the torch->flax name translators (no torch needed)."""

from speechdrivestemplates_tpu.utils.torch_import import (
    translate_autoencoder, translate_discriminator, translate_generator,
    translate_pose_encoder)


def test_generator_paths():
    assert translate_generator("audio_encoder.specgram_encoder_2d.0.0") == (
        "audio_encoder", "ConvNormRelu_0")
    assert translate_generator("audio_encoder.specgram_encoder_2d.3.1") == (
        "audio_encoder", "ConvNormRelu_7")
    assert translate_generator("unet.e0") == ("unet", "e0")
    assert translate_generator("unet.d5") == ("unet", "d5")
    assert translate_generator("decoder.2") == ("decoder_2",)
    assert translate_generator("decoder.4") == ("decoder_out",)
    assert translate_generator("something.else") is None


def test_discriminator_paths():
    assert translate_discriminator("seq.0") == ("ConvNormRelu_0",)
    assert translate_discriminator("seq.3") == ("Conv_0",)
    assert translate_discriminator("other") is None


def test_pose_encoder_paths():
    assert translate_pose_encoder("blocks.6") == ("ConvNormRelu_6",)


def test_autoencoder_paths():
    assert translate_autoencoder("encoder.blocks.2") == (
        "encoder", "ConvNormRelu_2")
    assert translate_autoencoder("decoder.d3") == ("decoder", "d3")
    assert translate_autoencoder("decoder.blocks.1") == ("decoder", "block_1")
    assert translate_autoencoder("decoder.blocks.4") == ("decoder", "out")
