from oxi_diel_db_spark.cli import main

main()
