#!/usr/bin/env perl
# Sun/Univa Grid Engine dispatcher with the Kaldi job-runner calling
# convention (fresh implementation; reference selects the dispatcher via
# $cmd, reference cmd.sh:12-15):
#
#   queue.pl [options] [JOB=1:N] <logfile> <command...>
#
# Submits the command as an SGE array job (qsub -sync y).  The batch
# script carries one case branch per task with JOB substituted up front
# (run.pl semantics — quoting in the user's command never meets a
# runtime ${SGE_TASK_ID} expansion), logs per task, and returns nonzero
# if any task fails.  Recognized resource options:
#
#   -q <queue>                      queue name
#   --mem <size>                    -l mem_free=<size>,ram_free=<size>
#   --num-threads / --num_threads <n>   -pe smp <n>
#   --gpu <n>                       -l gpu=<n>
#   --max-jobs-run <n>              -tc <n> (array concurrency cap)
#   --config <file>                 ignored (compatibility)
#
# Without `qsub` on PATH the job runs locally through run.pl with the
# same semantics (single-machine fallback).
use strict;
use warnings;
use FindBin;

require "$FindBin::Bin/job_dispatch_common.pl";

my %VALUELESS = map { $_ => 1 } ("-V", "-cwd", "-r");

my %res;
my @passthru;
while (@ARGV and $ARGV[0] =~ m/^-/) {
    my $opt = shift @ARGV;
    if ($opt =~ m/^(--[A-Za-z][\w-]*)=(.*)$/s) {   # --opt=value form
        push @passthru, $1, $2;
        next;
    }
    next if $VALUELESS{$opt};
    # a valueless unknown flag must not swallow the JOB spec / logfile
    my $val = (@ARGV and not main::jd_is_jobspec($ARGV[0]))
        ? shift @ARGV : "";
    if ($opt eq "-q" or $opt eq "--queue") {
        $res{queue} = $val;
    } elsif ($opt eq "--mem" or $opt eq "--max-mem") {
        $res{mem} = $val;
    } elsif ($opt eq "--num-threads" or $opt eq "--num_threads") {
        $res{cpus} = $val;
    } elsif ($opt eq "--gpu") {
        $res{gpu} = $val;
    } elsif ($opt eq "--max-jobs-run") {
        $res{maxrun} = $val;
    } elsif ($opt eq "--config") {
        # site config files are a Kaldi-ism we do not replicate
    } else {
        push @passthru, $opt;
        push @passthru, $val if $val ne "";
    }
}

my ($jobname, $jstart, $jend) = main::jd_parse_jobspec(\@ARGV);

die "queue.pl: usage: queue.pl [options] [JOB=1:N] <logfile> <command...>\n"
    unless @ARGV >= 2;

unless (main::jd_have_exe("qsub")) {
    warn "queue.pl: qsub not found on PATH; running locally via run.pl\n";
    my @fwd = defined $jobname ? ("$jobname=$jstart:$jend") : ();
    exec("$FindBin::Bin/run.pl", @fwd, @ARGV)
        or die "queue.pl: cannot exec run.pl\n";
}

my $logfile = shift @ARGV;
my $command = main::jd_quote_args(@ARGV);
my ($script, $name) = main::jd_script_and_name($logfile);
main::jd_write_batch_script($script, "SGE_TASK_ID", $logfile,
                            $command, $jobname, $jstart, $jend);

my @qsub = ("qsub", "-sync", "y", "-V", "-cwd", "-b", "n",
            "-o", "/dev/null", "-e", "/dev/null", "-N", $name);
if (defined $jobname or $jend > $jstart) {
    push @qsub, "-t", "$jstart-$jend";
    push @qsub, "-tc", $res{maxrun} if $res{maxrun};
}
push @qsub, "-q", $res{queue} if $res{queue};
push @qsub, "-l", "mem_free=$res{mem},ram_free=$res{mem}" if $res{mem};
push @qsub, "-pe", "smp", $res{cpus} if $res{cpus};
push @qsub, "-l", "gpu=$res{gpu}" if $res{gpu};
push @qsub, @passthru, $script;

my $ret = system(@qsub);
if ($ret != 0) {
    print STDERR "queue.pl: qsub reported failed tasks; see $logfile\n";
    exit 1;
}
exit 0;
