# Root conftest: make the in-repo package importable by pytest without install.
import os
import sys

sys.path.insert(0, os.path.dirname(__file__))
