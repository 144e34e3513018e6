"""Image pipeline: numpy-only codecs, perceptual hash, smart-crop
thumbnailing, deterministic stand-in detector/embedder (payload axis)."""
