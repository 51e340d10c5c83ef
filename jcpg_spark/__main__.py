"""``python -m jcpg_spark`` — see cli.py (Main.java analog)."""

from jcpg_spark.cli import main

if __name__ == "__main__":
    raise SystemExit(main())
