"""Ray Data operator stages of the KG-construction pipeline."""
