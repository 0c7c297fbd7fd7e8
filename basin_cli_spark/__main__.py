from basin_cli_spark.cli import main

raise SystemExit(main())
