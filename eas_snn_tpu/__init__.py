"""eas_snn_tpu — a TPU-native (JAX/XLA/Pallas/pjit) framework for event-based
object detection with adaptive recurrent spiking samplers.

Re-designed from scratch with the capabilities of EAS-SNN (ECCV 2024,
reference layout documented in SURVEY.md): a learnable event-to-frame front
end (recurrent convolutional SNN whose spikes adaptively segment the event
stream), feeding a YOLOX-style detector whose backbone/FPN/head can each be
spiking or analog.

Design stance (TPU-first, not a port):
  * every temporal loop is a ``jax.lax.scan`` with explicit functional neuron
    state — no stateful modules, no ``reset_net``;
  * surrogate gradients are ``jax.custom_vjp`` functions;
  * event->tensor binning runs on device via XLA scatter-add;
  * data parallelism is ``jit`` over a ``jax.sharding.Mesh`` (``psum`` for
    grads), not DDP/NCCL;
  * the ARSNN inner step is additionally available as a fused Pallas kernel.
"""

__version__ = "0.1.0"
