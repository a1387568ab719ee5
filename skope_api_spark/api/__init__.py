"""API façade: request models, pipeline service, legacy v1 adapter."""
