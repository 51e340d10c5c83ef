"""``python -m jcpg_spark`` — see cli.py (Main.java analog)."""

from jcpg_spark.cli import main

raise SystemExit(main())
