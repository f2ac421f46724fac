#!/usr/bin/env python
"""In-repo wrapper for the packaged CLI (``llm_pretraining_data_pipeline_spark.cli``
— installed as ``llm-pipeline-spark`` by pyproject.toml). See that module's
docstring for usage and outputs."""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from llm_pretraining_data_pipeline_spark.cli import main  # noqa: E402

if __name__ == "__main__":
    raise SystemExit(main())
