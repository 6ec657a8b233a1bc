"""Command-line drivers (reference L4 equivalents): sgcht, test_vector,
phrap, current_performance, test_sgcht, plus the data_gen module mains
(channelize/synthesize/generate_test_vector)."""
