"""``python -m data_integration_pipelines_spark`` — see cli.py."""

from .cli import main

raise SystemExit(main())
