#!/usr/bin/env python
"""Test runner (analog of reference tests/run_tests.py, which shells out to
`python -m unittest discover -s tests`): runs the whole pytest suite.

    python tests/run_tests.py [extra pytest args]
"""

import os
import sys

import pytest

if __name__ == "__main__":
    here = os.path.dirname(os.path.abspath(__file__))
    sys.exit(pytest.main(["-q", here, *sys.argv[1:]]))
