"""strongsort tracker — schedule lands in a later milestone this round."""
