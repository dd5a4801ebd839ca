"""Ray Data stage functions / actor classes for the KG pipeline."""
