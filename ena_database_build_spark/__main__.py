"""``python -m ena_database_build_spark`` — see cli.py."""

from ena_database_build_spark.cli import main

if __name__ == "__main__":
    main()
