"""tpu_slam — TPU-native 2D laser SLAM (JAX/XLA/Pallas/pjit)."""
