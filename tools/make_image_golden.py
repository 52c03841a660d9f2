#!/usr/bin/env python
"""(Re)generate the frozen end-to-end image golden (CPU, deterministic).

Writes tests/goldens/pipeline_tiny_image.npz — see
tests/test_image_golden.py for what it pins and when to regenerate.
"""

import os
import sys

import jax

jax.config.update("jax_platforms", "cpu")

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import numpy as np  # noqa: E402


def main():
    from tests.test_image_golden import GOLDEN_PATH, generate_golden_image

    img = generate_golden_image()
    os.makedirs(os.path.dirname(GOLDEN_PATH), exist_ok=True)
    np.savez_compressed(GOLDEN_PATH, image=img)
    print(f"wrote {GOLDEN_PATH}: shape {img.shape} mean {img.mean():.2f} "
          f"std {img.std():.2f}")


if __name__ == "__main__":
    main()
