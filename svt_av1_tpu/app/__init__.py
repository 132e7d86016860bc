"""Command-line apps (ref Source/App: SvtAv1EncApp / SvtAv1DecApp)."""
