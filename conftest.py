"""Repo-root conftest: ensures `femo_tpu` is importable without install."""

import os
import sys

sys.path.insert(0, os.path.dirname(__file__))
