"""Data sources: datacube ingestion/generation and loaders."""
