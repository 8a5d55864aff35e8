#!/bin/bash
# Test runner on a virtual 8-device CPU mesh.
# The axon sitecustomize (on the default PYTHONPATH) initializes the JAX
# backend at interpreter startup, which pins the device count; stripping it
# lets --xla_force_host_platform_device_count take effect.
cd "$(dirname "$0")"
PYTHONPATH="$(pwd)" JAX_PLATFORMS=cpu \
  XLA_FLAGS="--xla_force_host_platform_device_count=8" \
  exec python -m pytest "$@"
