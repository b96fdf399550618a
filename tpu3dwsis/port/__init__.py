"""Interoperability: import reference PyTorch checkpoints."""

from .torch_import import convert_state_dict, load_reference_checkpoint  # noqa: F401
