from sparkcheck.cli import main

raise SystemExit(main())
