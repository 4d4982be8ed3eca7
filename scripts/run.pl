#!/usr/bin/env perl
# Minimal local job runner with the Kaldi run.pl calling convention
# (fresh implementation):
#   run.pl [JOB=1:N] <logfile> <command...>
# JOB ranges fan out N local processes with JOB substituted in the log
# path and command; exit nonzero if any job fails.
# Jobspec parsing and argument re-quoting are shared with the scheduler
# dispatchers (job_dispatch_common.pl) so local and cluster execution
# keep identical semantics.

use strict;
use warnings;
use FindBin;

require "$FindBin::Bin/job_dispatch_common.pl";

# ignore scheduler-style options other tools may pass.  Options known to
# take a value (the queue.pl/slurm.pl sets) consume it UNCONDITIONALLY —
# values like "-l mem_free=4096" are name=digits shaped and would
# otherwise be mistaken for the JOB spec, shifting the real jobspec into
# the logfile position.  Only unknown options fall back to the
# is-it-the-jobspec heuristic (they may be valueless flags like -V).
my %VALUE_OPTS = map { $_ => 1 }
    ("-q", "-l", "-P", "-r", "-p", "-o", "-e", "-M", "-A", "-t",
     "--mem", "--max-mem", "--num-threads", "--num_threads", "--gpu",
     "--time", "--max-jobs-run", "--config");
while (@ARGV and $ARGV[0] =~ m/^-/) {
    my $opt = shift @ARGV;
    next if $opt =~ m/^--[A-Za-z][\w-]*=/;   # --opt=value, self-contained
    if ($opt eq "-pe") {                      # -pe takes TWO values
        splice(@ARGV, 0, 2) if @ARGV >= 2;
        next;
    }
    if ($VALUE_OPTS{$opt}) {
        shift @ARGV if @ARGV;
        next;
    }
    shift @ARGV if @ARGV and not main::jd_is_jobspec($ARGV[0]);
}

my ($jobname, $jstart, $jend) = main::jd_parse_jobspec(\@ARGV);

die "run.pl: usage: run.pl [JOB=1:N] <logfile> <command...>\n"
    unless @ARGV >= 2;
my $logfile = shift @ARGV;
my $command = main::jd_quote_args(@ARGV);

my @pids;
for my $job ($jstart .. $jend) {
    my $log = $logfile;
    my $cmd = $command;
    if (defined $jobname) {
        $log =~ s/\Q$jobname\E/$job/g;
        $cmd =~ s/\Q$jobname\E/$job/g;
    }
    my $pid = fork();
    die "run.pl: fork failed: $!\n" unless defined $pid;
    if ($pid == 0) {
        if ($log =~ m|/|) {
            (my $dir = $log) =~ s|/[^/]+$||;
            system("mkdir", "-p", $dir);
        }
        open(my $lfh, ">", $log) or die "run.pl: cannot open $log\n";
        print $lfh "# $cmd\n# started " . localtime() . "\n";
        close $lfh;
        my $ret = system("bash", "-c", "( $cmd ) >>$log 2>&1");
        open($lfh, ">>", $log) or exit(1);
        print $lfh "# finished " . localtime() . " status "
            . ($ret >> 8) . "\n";
        close $lfh;
        exit($ret == 0 ? 0 : 1);
    }
    push @pids, $pid;
}

my $failed = 0;
for my $pid (@pids) {
    waitpid($pid, 0);
    $failed++ if $? != 0;
}
if ($failed) {
    print STDERR "run.pl: $failed / " . scalar(@pids)
        . " jobs failed; see $logfile\n";
    exit 1;
}
exit 0;
