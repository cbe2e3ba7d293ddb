"""megacrn-tpu: TPU-native framework for the MegaCRN model family."""

__version__ = "0.1.0"
