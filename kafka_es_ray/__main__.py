from kafka_es_ray.cli import main

raise SystemExit(main())
