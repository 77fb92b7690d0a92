"""RAG layer: TF-IDF index, cosine top-k semantic search, intent router
(reference llm_app/)."""
