"""Pipeline builders: configured compositions of stage transforms."""
