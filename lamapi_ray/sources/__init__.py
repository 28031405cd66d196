"""Source readers (dump / csv / parquet)."""
