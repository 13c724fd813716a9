"""Sources: synthetic pages generator, testdata tables, whitespace files."""
