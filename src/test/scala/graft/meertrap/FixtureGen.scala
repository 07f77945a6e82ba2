package graft.meertrap

import java.nio.file.{Files, Path, Paths}

/** Generates a reference-shaped MeerTRAP candidate-directory tree
  * (FIXTURES.md §1-3) under a temp dir:
  *
  *   - 2 schedule blocks, 3 observations, 4 host run-summary files
  *   - one EXACT duplicate run summary (content-hash dedup, S2)
  *   - one corrupt JSON (per-file fault tolerance)
  *   - SB2 has expected_duration_seconds=0 + script durations (A4 fix-up)
  *   - obs1 has utc_stop=null (W1 lead inference)
  *   - candidates: as-of rounding edge (300ms after t_min), keep-first dedup
  *     pair, incoherent-beam match, and a 2-line SPCCL (quarantine)
  */
object FixtureGen {

  private def hostBeam(absnum: Int, coherent: Boolean, ip: String, port: Int): String =
    s"""{"absnum": $absnum, "coherent": $coherent, "dec_dms": "-43:33:09.0",
       | "mc_ip": "$ip", "mc_port": $port, "ra_hms": "4:40:17.07",
       | "relnum": $absnum, "source": "J0440-4333"}""".stripMargin

  private def runSummary(
      sbId: Long, sbCode: String, sbStart: String, durSecs: Long,
      script: String, utcStart: String, utcStop: Option[String],
      beams: Seq[String]): String = {
    val stop = utcStop.map(s => s""""$s"""").getOrElse("null")
    s"""{
       |  "beams": {
       |    "ca_target_request": {
       |      "beams": ["cfbf00000"],
       |      "tilings": [{
       |        "coordinate_type": "equatorial", "epoch": 1700517405.395673,
       |        "epoch_offset": 300.0, "method": "variable_size", "nbeams": 780,
       |        "overlap": 0.25, "reference_frequency": 1284000000.0,
       |        "shape": "circle",
       |        "target": "J0440-4333, radec gaincal, 4:40:17.07, -43:33:09.0"
       |      }],
       |      "unique_id": null
       |    },
       |    "cb_antennas": ["m000", "m001"],
       |    "coherent_beam_shape": {"angle": -54.5, "overlap": 0.25, "x": 0.008135, "y": 0.007491},
       |    "ib_antennas": ["m000"],
       |    "list": [${beams.mkString(", ")}]
       |  },
       |  "data": {"bw": 856.0, "cfreq": 1284.0, "nbeam": 768, "nbit": 8,
       |           "nchan": 1024, "npol": 1, "sync_time": 1700000000.0, "tsamp": 0.000306},
       |  "pipeline": {"opaque": true},
       |  "sb_details": {
       |    "id": $sbId, "id_code": "$sbCode",
       |    "actual_start_time": "$sbStart",
       |    "expected_duration_seconds": $durSecs,
       |    "proposal_id": "SCI-20231120-XX-01",
       |    "script_profile_config": "$script",
       |    "targets": "[{\\"track_start_offset\\": 32.6, \\"target\\": \\"J0408-6545\\", \\"track_duration\\": 600.0}]"
       |  },
       |  "utc_start": "$utcStart",
       |  "utc_stop": $stop,
       |  "version_info": {"app": "0.9"}
       |}""".stripMargin
  }

  /** MJD for a unix epoch-seconds instant (40587 = MJD of 1970-01-01). */
  def mjdOf(unixSeconds: Double): Double = unixSeconds / 86400.0 + 40587.0

  private def spcclLine(mjd: Double, dm: Double, width: Double, snr: Double,
                        beam: Int, mode: String): String =
    f"0\t$mjd%.11f\t$dm%.1f\t$width%.1f\t$snr%.1f\t$beam\t$mode\t4:40:17.07\t-43:33:09.0\t1\t0.97\t2023-11-20.fil\tplot_$beam$mode.jpg"

  /** @return fixture root */
  def generate(): Path = {
    val root = Files.createTempDirectory("meertrap_fixture")

    def dir(name: String): Path = {
      val d = root.resolve(name)
      Files.createDirectories(d)
      d
    }
    def write(d: Path, name: String, content: String): Unit =
      Files.writeString(d.resolve(name), content)

    val obs1Beams37 = Seq(hostBeam(0, coherent = false, "10.0.0.37", 1234),
      hostBeam(34, coherent = true, "10.0.0.37", 1234))
    val obs1Beams38 = Seq(hostBeam(35, coherent = true, "10.0.0.38", 1234))
    val obs2Beams   = Seq(hostBeam(0, coherent = false, "10.0.0.37", 1234),
      hostBeam(34, coherent = true, "10.0.0.37", 1234))
    val obs3Beams   = Seq(hostBeam(7, coherent = true, "10.0.0.39", 1234))

    val sb1Start = "2023-11-20 21:37:42.000000+00:00"
    val sb2Start = "2023-11-20 23:00:00.000000+00:00"
    val script   = "init duration=200\\\\n cal duration=100\\\\n"

    // obs1: two hosts, utc_stop null on both; tpn-0-37 summary duplicated
    // into a second candidate dir (content-hash dedup).
    val rs1a = runSummary(79119, "20231120-0012", sb1Start, 3600, script,
      "2023-11-20_21:57:11", None, obs1Beams37)
    val rs1b = runSummary(79119, "20231120-0012", sb1Start, 3600, script,
      "2023-11-20_21:57:11", None, obs1Beams38)
    // obs2: same SB, has utc_stop.
    val rs2 = runSummary(79119, "20231120-0012", sb1Start, 3600, script,
      "2023-11-20_22:10:00", Some("2023-11-20_22:20:00"), obs2Beams)
    // obs3: SB2 with zero duration -> script sum (200+100=300s).
    val rs3 = runSummary(79200, "20231120-0044", sb2Start, 0, script,
      "2023-11-20_23:05:00", Some("2023-11-20_23:15:00"), obs3Beams)

    // unix instants
    val obs1T = 1700517431L // 2023-11-20 21:57:11 UTC

    val d1 = dir(s"tpn-0-37_${obs1T + 20}")
    write(d1, "2023-11-20_tpn-0-37_run_summary.json", rs1a)
    write(d1, "2023-11-20_21-57-11_beam34.spccl.log",
      spcclLine(mjdOf(obs1T + 0.3), 247.5, 8.2, 11.3, 34, "C") + "\n")

    // duplicate content of rs1a in another candidate dir + dedup-pair cand
    // (same attributes as d1's, later processed_at -> dropped by A1).
    val d2 = dir(s"tpn-0-37_${obs1T + 600}")
    write(d2, "2023-11-20_tpn-0-37_run_summary.json", rs1a)
    write(d2, "2023-11-20_21-57-11_beam34b.spccl.log",
      spcclLine(mjdOf(obs1T + 0.3), 247.5, 8.2, 11.3, 34, "C") + "\n")

    val d3 = dir(s"tpn-0-38_${obs1T + 25}")
    write(d3, "2023-11-20_tpn-0-38_run_summary.json", rs1b)
    write(d3, "2023-11-20_21-57-30_beam35.spccl.log",
      spcclLine(mjdOf(obs1T + 19.0), 110.0, 4.0, 14.2, 35, "C") + "\n")

    // obs2 candidate on the incoherent beam; observed during obs2 so the
    // backward as-of must pick obs2's beam 0, not obs1's.
    val obs2T = 1700518200L // 22:10:00
    val d4 = dir(s"tpn-0-37_${obs2T + 330}")
    write(d4, "2023-11-20_tpn-0-37_run_summary.json", rs2)
    write(d4, "2023-11-20_22-15-30_beam0.spccl.log",
      spcclLine(mjdOf(obs2T + 330.6), 300.0, 12.0, 9.8, 0, "I") + "\n")

    val obs3T = 1700521500L // 23:05:00
    val d5 = dir(s"tpn-0-39_${obs3T + 100}")
    write(d5, "2023-11-20_tpn-0-39_run_summary.json", rs3)
    write(d5, "2023-11-20_23-06-40_beam7.spccl.log",
      spcclLine(mjdOf(obs3T + 100.0), 55.5, 2.0, 22.0, 7, "C") + "\n")

    // corrupt JSON (must not fail the job)
    val d6 = dir(s"tpn-0-40_${obs3T + 200}")
    write(d6, "2023-11-20_tpn-0-40_run_summary.json", "{ not json !!")

    // 2-line SPCCL (must be quarantined per-file)
    val d7 = dir(s"tpn-0-41_${obs3T + 300}")
    write(d7, "2023-11-20_23-10-00_beam9.spccl.log",
      spcclLine(mjdOf(obs3T + 300.0), 60.0, 2.0, 10.0, 9, "C") + "\n" +
        spcclLine(mjdOf(obs3T + 301.0), 61.0, 2.0, 10.0, 9, "C") + "\n")

    root
  }
}
