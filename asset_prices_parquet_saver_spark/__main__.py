from asset_prices_parquet_saver_spark.cli import main

raise SystemExit(main())
