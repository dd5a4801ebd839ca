"""Sources: synthetic Common-Crawl-style pages + pruned Parquet readers."""
