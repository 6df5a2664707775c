"""Sources: zip-of-XML changelog scan (reference parity) + changelog readers."""
