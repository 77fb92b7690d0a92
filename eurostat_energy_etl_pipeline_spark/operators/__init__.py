"""LLM-data-pipeline operators: deduplication, similarity search, text
analysis, multimodal column plumbing. All are DataFrame -> DataFrame
transforms designed shuffle-minimal for the 100 TB path."""
