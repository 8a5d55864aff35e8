"""Model zoo (parity: dance/modules/)."""
