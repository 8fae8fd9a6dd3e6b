"""Command-line entry points (run as ``python -m speech_enhancement_tpu.cli.<name>``):

main_gan / inference_gan           SCP-GAN / CMGAN training + evaluation
main_diffuse / inference_diffuse   conditional diffusion training + sampling
cdiffuse / cdiffuse_inference      the standalone CDiffuSE mini-framework
preprocess                         offline spectrogram extraction
convert_checkpoint                 reference .pth.tar -> servable orbax dir
"""
